"""Walkthrough-site revisit: oracle-free semantically-targeted
exploration goals.

The GT semantic-search arm (reference: agent.py:368-388) proves most
of the directed-exploration headroom is *semantic* — knowing where
objects are beats covering more floor (docs/experiments.md,
multi-room sweeps).  The agent already holds semantic memory: the
completed walkthrough map.  This head sends unshuffle-phase
exploration goals to the walkthrough map's object sites (the same
`find_all_classes` localization the matcher runs, match/find.py), so
the unshuffle map gets evidence exactly where cross-phase
disagreement is decidable: an object missing from its walkthrough
site is half of a difference pair, and objects usually move *between*
sites (THOR rearrangement swaps poses), so sites also concentrate
probability mass for the shuffled locations.

No oracle, no training: everything derives from the agent's own maps.
Beyond the reference — its goal heads are uniform random / GT / a
learned CNN (agent.py:389-425, 744-770).
"""

from __future__ import annotations

from typing import Optional, Set

import numpy as np

from mass_tpu import taxonomy
from mass_tpu.config import MatchConfig
from mass_tpu.core.voxelmap import VoxelMap
from mass_tpu.match.find import find_all_classes

# classes the matcher can act on (match/differences.py skips everything
# else): structure mass (OccupiedSpace, class 0) must not spend goal
# slots — its blobs are walls and furniture, never differences
_ACTIONABLE = np.asarray(
    [p or o for p, o in zip(taxonomy.ID_TO_PICKABLE,
                            taxonomy.ID_TO_OPENABLE)])


def walkthrough_sites(vm0: VoxelMap, match: MatchConfig) -> np.ndarray:
    """[N, 3] world positions of every ACTIONABLE-class instance
    localized in the walkthrough map, using the matcher's own
    detection parameters — including its adaptive instance-cap
    escalation (match/differences.py doubles K on truncation; a
    silent cap here would drop revisit sites in dense scenes)."""
    k = match.max_instances
    while True:
        inst = find_all_classes(
            vm0, confidence_threshold=match.confidence_threshold,
            contour_padding=match.contour_padding,
            contour_threshold=match.contour_threshold,
            max_instances=k)
        trunc = np.asarray(inst.truncated).astype(bool)
        if k >= 256 or not bool((trunc & _ACTIONABLE).any()):
            break
        k *= 2
    present = np.asarray(inst.present) & _ACTIONABLE[:, None]  # [C, K]
    pos = np.asarray(inst.position)             # [C, K, 3]
    return pos[present].astype(np.float32)


def pick_site(sites: np.ndarray, used: Set[int],
              rng) -> Optional[np.ndarray]:
    """Uniformly pick an unused site index via ``rng`` and mark it
    used; None once every site has been visited (callers fall back to
    frontier/random).  Uniform (not nearest-first) keeps the rng
    stream's role identical to the random head's, so matched-seed
    arms stay comparable."""
    unused = [i for i in range(len(sites)) if i not in used]
    if not unused:
        return None
    i = unused[rng.randint(len(unused))]
    used.add(i)
    return sites[i]
