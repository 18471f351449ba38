"""Table-driven tests of the torus-roll slice algebra.

Mirrors the reference's pure-host suite (test/lbm/main.cpp:116-412:
noOffset / rollUp / rollDown / rollRight / rollLeft / rollDownAndLeft ...),
asserting each region copy and the end-to-end equivalence with np.roll.
"""

import numpy as np
import pytest

from lbm_tpu.utils.roll_slices import (
    RegionCopy,
    copy_volumes,
    determine_src_dst_slices,
    rolled_copy,
)

ALL_ROLLS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


class TestRegionTables:
    def test_no_offset_is_identity(self):
        regions = determine_src_dst_slices((4, 6), (0, 0))
        assert regions == [RegionCopy((0, 4), (0, 6), (0, 4), (0, 6))]

    def test_roll_up_one(self):
        # roll -1 rows: dst[0:3] = src[1:4], dst[3:4] = src[0:1]
        regions = determine_src_dst_slices((4, 6), (-1, 0))
        assert RegionCopy((1, 4), (0, 6), (0, 3), (0, 6)) in regions
        assert RegionCopy((0, 1), (0, 6), (3, 4), (0, 6)) in regions
        assert len(regions) == 2

    def test_roll_right_one(self):
        regions = determine_src_dst_slices((4, 6), (0, 1))
        assert RegionCopy((0, 4), (0, 5), (0, 4), (1, 6)) in regions
        assert RegionCopy((0, 4), (5, 6), (0, 4), (0, 1)) in regions

    def test_roll_down_and_left_has_four_regions(self):
        regions = determine_src_dst_slices((4, 6), (1, -1))
        assert len(regions) == 4
        # total copied volume covers the grid exactly once
        assert sum(copy_volumes((4, 6), (1, -1))) == 24


class TestEquivalenceWithRoll:
    @pytest.mark.parametrize("roll", ALL_ROLLS)
    def test_matches_np_roll(self, roll):
        rng = np.random.default_rng(hash(roll) % 2**32)
        src = rng.uniform(size=(5, 7)).astype(np.float32)
        np.testing.assert_array_equal(
            rolled_copy(src, roll), np.roll(src, roll, axis=(0, 1))
        )

    def test_regions_are_disjoint_and_complete(self):
        for roll in ALL_ROLLS:
            seen = np.zeros((5, 7), bool)
            for rc in determine_src_dst_slices((5, 7), roll):
                block = seen[rc.dst_rows[0]:rc.dst_rows[1], rc.dst_cols[0]:rc.dst_cols[1]]
                assert not block.any(), "overlapping dst regions"
                seen[rc.dst_rows[0]:rc.dst_rows[1], rc.dst_cols[0]:rc.dst_cols[1]] = True
            assert seen.all(), "dst regions do not tile the grid"
