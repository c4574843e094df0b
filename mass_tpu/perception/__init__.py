from mass_tpu.perception.segmentation import (  # noqa: F401
    colors_to_classes, detections_to_semantic, SegmentationModel)
