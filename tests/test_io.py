import os

import numpy as np
import jax.numpy as jnp

from cnmf_e_tpu.io.export import load_results, save_results, save_results_mat
from cnmf_e_tpu.io.movie import load_movie, probe_movie
from cnmf_e_tpu.io.store import distribute_movie
from cnmf_e_tpu.io.tiff import probe_tiff, read_tiff, write_tiff
from cnmf_e_tpu.models.state import empty_state


def test_tiff_roundtrip(tmp_path, rng):
    movie = (rng.random((7, 33, 41)) * 1000).astype(np.uint16)
    p = str(tmp_path / "m.tif")
    write_tiff(p, movie)
    info = probe_tiff(p)
    assert info.shape == (7, 33, 41)
    back = read_tiff(p)
    np.testing.assert_array_equal(back, movie)
    part = read_tiff(p, start=2, count=3)
    np.testing.assert_array_equal(part, movie[2:5])


def test_tiff_float32(tmp_path, rng):
    movie = rng.standard_normal((4, 16, 16)).astype(np.float32)
    p = str(tmp_path / "f.tif")
    write_tiff(p, movie)
    np.testing.assert_allclose(read_tiff(p), movie)


def test_hdf5_and_npy(tmp_path, rng):
    import h5py
    movie = rng.standard_normal((9, 12, 15)).astype(np.float32)
    hp = str(tmp_path / "m.h5")
    with h5py.File(hp, "w") as f:
        f.create_dataset("mov", data=movie)
    assert probe_movie(hp)[0] == (9, 12, 15)
    np.testing.assert_allclose(load_movie(hp, 3, 4), movie[3:7])

    np_path = str(tmp_path / "m.npy")
    np.save(np_path, movie)
    np.testing.assert_allclose(load_movie(np_path), movie)


def test_distribute_movie_and_store(tmp_path, rng):
    movie = rng.standard_normal((25, 10, 11)).astype(np.float32)
    src = str(tmp_path / "m.npy")
    np.save(src, movie)
    store = distribute_movie(src, str(tmp_path / "store"),
                             frames_per_block=10)
    assert store.shape == (25, 10, 11)
    assert store.n_blocks() == 3
    np.testing.assert_allclose(store.read_frames(8, 10), movie[8:18])
    # reuse without rewrite
    store2 = distribute_movie(src, str(tmp_path / "store"),
                              frames_per_block=10)
    assert store2.shape == (25, 10, 11)
    store.save_noise(np.ones((10, 11)))
    assert store2.load_noise() is not None


def test_export_roundtrip(tmp_path):
    st = empty_state(8, 16, 16, 50)
    st = st.replace(active=st.active.at[:3].set(True),
                    A=st.A.at[:3, 4:8, 4:8].set(1.0),
                    C=st.C.at[:3].set(2.0))
    p = save_results(str(tmp_path / "res"), st)
    data = load_results(p)
    assert data["A"].shape == (3, 16, 16)
    assert data["C"].shape == (3, 50)

    mp = save_results_mat(str(tmp_path / "res"), st)
    import scipy.io
    mat = scipy.io.loadmat(mp)
    assert mat["A"].shape == (256, 3)


def test_avi_roundtrip(tmp_path, rng):
    from cnmf_e_tpu.io.avi import read_avi, write_avi
    movie = (rng.random((5, 24, 31)) * 255).astype(np.uint8)
    p = str(tmp_path / "m.avi")
    write_avi(p, movie)
    assert probe_movie(p)[0] == (5, 24, 31)
    back = read_avi(p)
    np.testing.assert_array_equal(back, movie)
    np.testing.assert_allclose(load_movie(p, 1, 2), movie[1:3])
