"""Native fastload tests: C parser vs numpy oracle (and the fallback path)."""

import numpy as np

from t5gemma_tts_tpu.native import fastload


def test_native_builds():
    assert fastload.available(), "native fastload failed to build"


def test_parse_token_file(tmp_path):
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 65536, 5000).astype(np.int32)
    p = tmp_path / "codes.txt"
    p.write_text(" ".join(map(str, vals)) + "\nsecond line ignored")
    got = fastload.parse_token_file(str(p))
    np.testing.assert_array_equal(got, vals)


def test_parse_tokens_negatives_and_whitespace():
    got = fastload.parse_tokens(b"  1\t-2   33 \r 4\n999")
    np.testing.assert_array_equal(got, [1, -2, 33, 4])


def test_pad_pack():
    rows = [np.arange(3, dtype=np.int32), np.arange(7, dtype=np.int32),
            np.empty(0, np.int32)]
    out = fastload.pad_pack(rows, 5, pad_value=-9)
    np.testing.assert_array_equal(out[0], [0, 1, 2, -9, -9])
    np.testing.assert_array_equal(out[1], [0, 1, 2, 3, 4])  # truncated
    np.testing.assert_array_equal(out[2], [-9] * 5)


def test_parser_speed_sanity(tmp_path):
    """The C parser must at least match the Python fallback output on a
    large file (speed itself is environment-dependent)."""
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 65536, 60000).astype(np.int32)
    p = tmp_path / "big.txt"
    p.write_text(" ".join(map(str, vals)))
    got = fastload.parse_token_file(str(p))
    with open(p) as f:
        ref = np.asarray(f.readline().split(), np.int32)
    np.testing.assert_array_equal(got, ref)
