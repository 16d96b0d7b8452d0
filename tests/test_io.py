import os

import numpy as np
import pytest
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


# ---------------- compressed / multi-strip TIFF fixtures ---------------- #

def _lzw_encode(data: bytes) -> bytes:
    """Reference TIFF-LZW encoder (MSB-first, early change) for fixtures."""
    CLEAR, EOI = 256, 257
    out_bits = []
    nbits = 9

    def emit(code):
        out_bits.append((code, emit.nbits))
    emit.nbits = 9

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
        else:
            emit(table[w])
            table[wc] = next_code
            next_code += 1
            # early change: widen when the NEXT code would not fit
            if next_code == (1 << emit.nbits) - 1:
                emit.nbits += 1
            if next_code == 4094:
                emit(CLEAR)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                emit.nbits = 9
            w = bytes([ch])
    if w:
        emit(table[w])
    emit(EOI)
    # pack MSB-first
    acc = 0
    accbits = 0
    out = bytearray()
    for code, nb in out_bits:
        acc = (acc << nb) | code
        accbits += nb
        while accbits >= 8:
            accbits -= 8
            out.append((acc >> accbits) & 0xFF)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """Trivial PackBits encoder: literal runs of <= 128 bytes."""
    out = bytearray()
    for i in range(0, len(data), 128):
        chunk = data[i:i + 128]
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


def _write_tiff_compressed(path, movie, comp, strips_per_frame=2,
                           predictor=1):
    """Classic multi-IFD grayscale TIFF with per-strip compression."""
    import struct
    import zlib
    movie = np.ascontiguousarray(movie)
    T, H, W = movie.shape
    dt = movie.dtype
    bits = dt.itemsize * 8
    fmt = {"u": 1, "i": 2, "f": 3}[dt.kind]
    rows = -(-H // strips_per_frame)

    strip_payloads = []   # list per frame of list of bytes
    for t in range(T):
        frame = movie[t]
        if predictor == 2:
            frame = np.concatenate(
                [frame[:, :1], np.diff(frame, axis=1)], axis=1
            ).astype(dt)
        strips = []
        for s in range(strips_per_frame):
            seg = frame[s * rows:(s + 1) * rows].tobytes()
            if comp == 5:
                seg = _lzw_encode(seg)
            elif comp == 8:
                seg = zlib.compress(seg)
            elif comp == 32773:
                seg = _packbits_encode(seg)
            strips.append(seg)
        strip_payloads.append(strips)

    n_tags = 10
    ifd_size = 2 + n_tags * 12 + 4
    # strip offset/count arrays live right after all IFDs
    with open(path, "wb") as f:
        f.write(b"II*\x00" + struct.pack("<I", 8))
        arrays_base = 8 + T * ifd_size
        # each frame needs 2 arrays of strips_per_frame u32 (offsets+counts)
        arr_bytes = strips_per_frame * 4
        data_base = arrays_base + T * 2 * arr_bytes
        offs_all = []
        pos = data_base
        for strips in strip_payloads:
            offs = []
            for s in strips:
                offs.append(pos)
                pos += len(s)
            offs_all.append(offs)

        def tag(t, typ, cnt, val):
            return struct.pack("<HHI4s", t, typ, cnt, struct.pack("<I", val))

        for t in range(T):
            off_arr_ptr = arrays_base + t * 2 * arr_bytes
            cnt_arr_ptr = off_arr_ptr + arr_bytes
            entries = [
                tag(256, 4, 1, W), tag(257, 4, 1, H), tag(258, 3, 1, bits),
                tag(259, 3, 1, comp), tag(262, 3, 1, 1),
                tag(273, 4, strips_per_frame,
                    off_arr_ptr if strips_per_frame > 1 else offs_all[t][0]),
                tag(278, 4, 1, rows),
                tag(279, 4, strips_per_frame,
                    cnt_arr_ptr if strips_per_frame > 1
                    else len(strip_payloads[t][0])),
                tag(317, 3, 1, predictor),
                tag(339, 3, 1, fmt),
            ]
            nxt = 8 + (t + 1) * ifd_size if t + 1 < T else 0
            f.write(struct.pack("<H", n_tags) + b"".join(entries)
                    + struct.pack("<I", nxt))
        for t in range(T):
            f.write(struct.pack(f"<{strips_per_frame}I", *offs_all[t]))
            f.write(struct.pack(
                f"<{strips_per_frame}I",
                *[len(s) for s in strip_payloads[t]]))
        for strips in strip_payloads:
            for s in strips:
                f.write(s)


def test_tiff_compressed_roundtrip(tmp_path):
    """LZW / Deflate / PackBits + multi-strip + predictor fixtures decode
    exactly (smod_bigread2.m reads all of these)."""
    from cnmf_e_tpu.io.tiff import read_tiff
    rng = np.random.default_rng(5)
    movie = (rng.integers(0, 4000, (4, 30, 17))).astype(np.uint16)
    for comp in (5, 8, 32773):
        p = str(tmp_path / f"c{comp}.tif")
        _write_tiff_compressed(p, movie, comp, strips_per_frame=2)
        out = read_tiff(p)
        np.testing.assert_array_equal(out, movie), comp
    # horizontal predictor with LZW (the common ImageJ/libtiff combo)
    p = str(tmp_path / "lzw_pred.tif")
    _write_tiff_compressed(p, movie, 5, strips_per_frame=3, predictor=2)
    np.testing.assert_array_equal(read_tiff(p), movie)


def test_tiff_multistrip_uncompressed(tmp_path):
    from cnmf_e_tpu.io.tiff import read_tiff
    rng = np.random.default_rng(6)
    movie = rng.standard_normal((3, 25, 12)).astype(np.float32)
    p = str(tmp_path / "ms.tif")
    _write_tiff_compressed(p, movie, 1, strips_per_frame=4)
    np.testing.assert_array_equal(read_tiff(p), movie)


def test_bigtiff_write_read_roundtrip(tmp_path):
    from cnmf_e_tpu.io.tiff import probe_tiff, read_tiff, write_tiff
    rng = np.random.default_rng(7)
    movie = rng.standard_normal((5, 16, 20)).astype(np.float32)
    p = str(tmp_path / "big.tif")
    write_tiff(p, movie, bigtiff=True)
    with open(p, "rb") as f:
        hdr = f.read(4)
    assert hdr[2] == 43  # BigTIFF magic
    info = probe_tiff(p)
    assert info.shape == (5, 16, 20)
    np.testing.assert_array_equal(read_tiff(p), movie)
    # partial reads
    np.testing.assert_array_equal(read_tiff(p, 2, 2), movie[2:4])


def test_mjpeg_avi_decode(tmp_path):
    """MJPEG AVI (cv2-encoded fixture) decodes via the per-chunk JPEG path
    with random access (smod_bigread2.m VideoReader role)."""
    cv2 = pytest.importorskip("cv2")
    from cnmf_e_tpu.io.avi import probe_avi, read_avi
    rng = np.random.default_rng(8)
    H, W, T = 48, 64, 6
    # smooth movie so JPEG loss stays small
    base = rng.integers(60, 200, (H // 8, W // 8)).astype(np.uint8)
    movie = np.stack([
        np.clip(cv2.resize(base, (W, H),
                           interpolation=cv2.INTER_CUBIC).astype(np.int16)
                + 5 * t, 0, 255).astype(np.uint8)
        for t in range(T)])
    p = str(tmp_path / "m.avi")
    vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                         (W, H), isColor=False)
    assert vw.isOpened()
    for t in range(T):
        vw.write(movie[t])
    vw.release()

    info = probe_avi(p)
    assert info.codec == "mjpeg"
    assert info.shape == (T, H, W)
    out = read_avi(p)
    assert out.shape == (T, H, W)
    # JPEG is lossy: mean abs error small, frames well correlated
    err = np.abs(out.astype(np.float64) - movie).mean()
    assert err < 4.0, err
    # random access mid-stream
    part = read_avi(p, 3, 2)
    np.testing.assert_array_equal(part, out[3:5])
