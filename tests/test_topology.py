"""Pin the topology tables against the literal upstream constants.

The reference's demo decode hardcodes ``limbSeq`` (1-indexed part pairs)
and ``mapIdx`` (PAF channel pairs offset by 19). Our tables are derived
from part names; these tests prove they reproduce the literal values
(SURVEY.md C1/C10 contract).
"""

import numpy as np

from tpupose import topology

# Literal upstream tables (1-indexed parts; PAF channels offset by 19).
LIMB_SEQ = [
    [2, 3], [2, 6], [3, 4], [4, 5], [6, 7], [7, 8], [2, 9], [9, 10],
    [10, 11], [2, 12], [12, 13], [13, 14], [2, 1], [1, 15], [15, 17],
    [1, 16], [16, 18], [3, 17], [6, 18],
]
MAP_IDX = [
    [31, 32], [39, 40], [33, 34], [35, 36], [41, 42], [43, 44], [19, 20],
    [21, 22], [23, 24], [25, 26], [27, 28], [29, 30], [47, 48], [49, 50],
    [53, 54], [51, 52], [55, 56], [37, 38], [45, 46],
]


def test_channel_counts():
    assert topology.NUM_PARTS == 18
    assert topology.NUM_HEAT_CHANNELS == 19
    assert topology.NUM_LIMBS == 19
    assert topology.NUM_PAF_CHANNELS == 38
    assert topology.NUM_GT_CHANNELS == 57


def test_decode_pairs_match_limbseq():
    pairs, _ = topology.decode_limb_tables()
    expected = np.asarray(LIMB_SEQ) - 1
    np.testing.assert_array_equal(pairs, expected)


def test_decode_paf_channels_match_mapidx():
    _, chans = topology.decode_limb_tables()
    expected = np.asarray(MAP_IDX) - 19
    np.testing.assert_array_equal(chans, expected)


def test_flip_permutation_is_involution():
    perm = np.asarray(topology.FLIP_PERMUTATION)
    np.testing.assert_array_equal(perm[perm], np.arange(18))
    # nose/neck fixed, L<->R swapped
    assert perm[0] == 0 and perm[1] == 1
    assert perm[topology.PART_INDEX["Lsho"]] == topology.PART_INDEX["Rsho"]
    assert perm[topology.PART_INDEX["Rear"]] == topology.PART_INDEX["Lear"]


def test_limb_channel_ownership():
    # limb k owns PAF channels (2k, 2k+1); neck->Rsho is GT limb 6
    assert topology.LIMBS[6] == (
        topology.PART_INDEX["neck"],
        topology.PART_INDEX["Rsho"],
    )
    assert topology.DECODE_LIMB_ORDER[0] == 6
