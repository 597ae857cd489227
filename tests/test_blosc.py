"""Blosc-1 codec tests: cross-validation of the native (C++) and pure-Python
implementations, known-vector LZ4 decode, zarrlite integration, and a
WB2-style blosc-lz4-shuffle raw store round-tripped through preprocess()
(reference ingests such stores via numcodecs, scripts/preprocess_dataset.py)."""

import numpy as np
import pytest

from paradis_tpu.data import blosc, native, zarrlite


def _payloads():
    rng = np.random.default_rng(0)
    smooth = np.cumsum(rng.normal(size=4096).astype(np.float32)).tobytes()
    return {
        "smooth_f32": (smooth, 4),
        "random_f32": (rng.normal(size=777).astype(np.float32).tobytes(), 4),
        "zeros_f64": (np.zeros(513, np.float64).tobytes(), 8),
        "tiny": (b"abcdabcdabcdabcd", 4),
        "repetitive": (b"0123456789" * 2000, 1),
        # > one 256 KB auto block, with a leftover block (exercises the
        # leftover-never-split rule)
        "multiblock": (np.cumsum(rng.normal(
            size=90000).astype(np.float32)).tobytes(), 4),
    }


@pytest.mark.parametrize("cname", ["lz4", "zlib", "zstd"])
@pytest.mark.parametrize("shuffle", [blosc.NOSHUFFLE, blosc.SHUFFLE])
def test_native_frame_roundtrip_both_decoders(cname, shuffle):
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    for name, (raw, ts) in _payloads().items():
        frame = blosc.encode(raw, typesize=ts, cname=cname, shuffle=shuffle)
        assert blosc.decode(frame, len(raw)) == raw, name
        # the independent pure-python decoder must agree on the same bytes
        assert blosc._decode_frame_py(frame, len(raw)) == raw, name


def test_python_encoder_decodes_natively():
    for name, (raw, ts) in _payloads().items():
        frame = blosc._encode_frame_py(raw, ts, clevel=5,
                                       shuffle=blosc.SHUFFLE, blocksize=0)
        assert blosc._decode_frame_py(frame, len(raw)) == raw, name
        if native.get_lib() is not None:
            assert blosc.decode(frame, len(raw)) == raw, name


def test_lz4_split_path_is_exercised():
    """The c-blosc split rule (lz4, typesize<=16, block/typesize>=128) must
    trigger so decoders handle typesize sub-streams."""
    raw = np.cumsum(np.random.default_rng(1).normal(
        size=8192).astype(np.float32)).tobytes()
    frame = blosc.encode(raw, typesize=4, cname="lz4", shuffle=blosc.SHUFFLE)
    flags = frame[2]
    if native.get_lib() is not None:
        assert not (flags & 0x10), "expected a split frame"
    assert blosc._decode_frame_py(frame, len(raw)) == raw


def test_lz4_known_vector():
    # token 0x40: 4 literals "abcd"; match offset 4, len 4 -> "abcdabcd"
    stream = bytes([0x40]) + b"abcd" + bytes([0x04, 0x00])
    assert blosc._lz4_decode_py(stream, 8) == b"abcdabcd"


def test_handcrafted_memcpyed_and_zero_run_frames():
    import struct

    raw = b"\x01\x02\x03\x04" * 8
    header = bytearray(16)
    header[0], header[1], header[2], header[3] = 2, 1, (1 << 5) | 0x2, 4
    struct.pack_into("<iii", header, 4, len(raw), len(raw), len(raw) + 16)
    frame = bytes(header) + raw
    assert blosc.decode(frame, len(raw)) == raw
    assert blosc._decode_frame_py(frame, len(raw)) == raw

    # zero-run sub-stream: one block, dont-split, csize == 0
    n = 64
    header = bytearray(16)
    header[0], header[1], header[2], header[3] = 2, 1, (1 << 5) | 0x10, 4
    struct.pack_into("<iii", header, 4, n, n, 16 + 4 + 4)
    frame = bytes(header) + struct.pack("<i", 20) + struct.pack("<i", 0)
    assert blosc.decode(frame, n) == b"\x00" * n
    assert blosc._decode_frame_py(frame, n) == b"\x00" * n


def test_unsupported_codec_raises_clearly():
    import struct

    header = bytearray(16)
    header[0], header[1], header[2], header[3] = 2, 1, (2 << 5), 4  # snappy
    struct.pack_into("<iii", header, 4, 16, 16, 36)
    with pytest.raises(blosc.BloscError, match="snappy"):
        blosc.decode(bytes(header) + b"\x00" * 20, 16)


def test_zarrlite_blosc_array_roundtrip(tmp_path):
    data = np.cumsum(
        np.random.default_rng(2).normal(size=(6, 8, 16)), axis=-1
    ).astype(np.float32)
    arr = zarrlite.create_array(
        tmp_path / "a", shape=data.shape, chunks=(1, 8, 16), dtype=np.float32,
        compressor={"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1},
        data=data,
    )
    got = zarrlite.Array(tmp_path / "a")[...]
    np.testing.assert_array_equal(got, data)
    # batched fast path
    batch = zarrlite.Array(tmp_path / "a").read_first_axis_batch(1, 5)
    np.testing.assert_array_equal(batch, data[1:5])


def test_preprocess_ingests_blosc_wb2_store(tmp_path):
    """A WB2-mirroring blosc-lz4-shuffle raw store must preprocess cleanly
    and match the result from the identical zlib-compressed store."""
    from paradis_tpu.data.preprocess import preprocess
    from paradis_tpu.data.synthetic import build_raw_store

    kw = dict(nlat=8, nlon=16, n_times=8, levels=(500, 850, 1000),
              start="2000-01-01T00:00:00", seed=11)
    build_raw_store(str(tmp_path / "raw_blosc"), compressor={
        "id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1,
        "blocksize": 0}, **kw)
    build_raw_store(str(tmp_path / "raw_zlib"), **kw)
    preprocess(str(tmp_path / "raw_blosc"), str(tmp_path / "out_blosc"),
               toa_time_stride=6)
    preprocess(str(tmp_path / "raw_zlib"), str(tmp_path / "out_zlib"),
               toa_time_stride=6)
    for year in ["2000"]:
        a = zarrlite.open_store(tmp_path / "out_blosc" / year)["data"][...]
        b = zarrlite.open_store(tmp_path / "out_zlib" / year)["data"][...]
        np.testing.assert_array_equal(a, b)
