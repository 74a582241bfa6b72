"""Neighbor machinery: cell binning, padded buckets, neighbor lists, rebuild
(SURVEY.md §2a row 6, §2b rows 18-19, §3.4)."""

from meso_tpu.neighbor.cells import CellConfig, CellList, build_cells, cell_index
from meso_tpu.neighbor.nlist import NeighborList, build_nlist

__all__ = ["CellConfig", "CellList", "build_cells", "cell_index",
           "NeighborList", "build_nlist"]
