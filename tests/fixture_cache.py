"""Disk cache for expensive trained test fixtures.

The convergence trainings dominate the full suite's wall clock
(trained_unet ~10 min, the trained-weights torch-parity model ~8 min
under load); their OUTPUT is deterministic given the training code, so
repeat local runs — the "full suite before milestone commits" loop —
can reuse the weights instead of retraining.  The cache lives under
``checkpoints/test-fixtures/`` (gitignored: the Mask R-CNN fixture
carries an R50-FPN backbone, tens of MB) and is invalidated by bumping
the fixture's ``version`` when its training recipe changes, or
globally with ``MASS_TEST_FIXTURE_REFRESH=1``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Tuple

CACHE_DIR = os.environ.get(
    "MASS_TEST_FIXTURE_CACHE",
    os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                 "test-fixtures"))


def cached_pytree(name: str, version: str, template: Any,
                  builder: Callable[[], Tuple[Any, Dict]],
                  ) -> Tuple[Any, Dict]:
    """Return ``builder()``'s (pytree, meta-dict), cached on disk.

    ``template`` is a structure-matching pytree (e.g. freshly
    initialized params) used to restore; ``meta`` must be
    JSON-serializable (training loss etc.).  A version mismatch or
    ``MASS_TEST_FIXTURE_REFRESH=1`` rebuilds."""
    from mass_tpu.utils.checkpoint import load_pytree, save_pytree

    path = os.path.abspath(os.path.join(CACHE_DIR, name))
    meta_path = os.path.join(path, "meta.json")
    if not os.environ.get("MASS_TEST_FIXTURE_REFRESH"):
        try:
            with open(meta_path) as f:
                meta = json.load(f)
            if meta.get("__version") == version:
                tree = load_pytree(os.path.join(path, "tree"),
                                   template)
                return tree, meta
        except (FileNotFoundError, ValueError):
            pass
    tree, meta = builder()
    meta = dict(meta, __version=version)
    os.makedirs(path, exist_ok=True)
    save_pytree(os.path.join(path, "tree"), tree)
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return tree, meta
