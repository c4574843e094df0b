from mass_tpu.match.find import find_class_instances, find_all_classes  # noqa: F401
from mass_tpu.match.differences import predict_scene_differences  # noqa: F401
