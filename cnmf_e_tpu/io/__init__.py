"""Data layer: movie readers (TIFF/HDF5/AVI/NPY), chunked store, export.

Reference layer L0 (SURVEY.md section 1): ``smod_bigread2`` readers +
``distribute_data``'s blocked HDF5 file. Here movies ingest into a simple
directory-of-npy-chunks store (frame-blocked), and stream to device as
(T_block, H, W) slabs; on-device sharding replaces the patch files.
"""

from cnmf_e_tpu.io.movie import load_movie, probe_movie
from cnmf_e_tpu.io.store import MovieStore, distribute_movie

__all__ = ["load_movie", "probe_movie", "MovieStore", "distribute_movie"]
