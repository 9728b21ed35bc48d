"""Unit tests for the perceptual dHash operator (operators/imagehash.py,
r10): the REAL PNG-decode pipeline must equal the md5 closed form the
SQL oracle uses; the banding theorem must hold; planted perturbations
must move few bits."""

import numpy as np
import pytest

from duckdb_title_mapper_spark.operators.imagehash import (
    GRID_COLS,
    GRID_ROWS,
    dhash_bands_from_png,
    encode_tile_png,
    tile_values,
)


def _bands_closed_form(v: np.ndarray) -> tuple:
    bits = (v[:, 1:] > v[:, :-1]).astype(int)
    out = []
    for k in range(4):
        val = 0
        for rr in range(2):
            for c in range(8):
                val |= int(bits[2 * k + rr, c]) << (rr * 8 + c)
        out.append(val)
    return tuple(out)


def _hamming(a: tuple, b: tuple) -> int:
    return sum(bin(x ^ y).count("1") for x, y in zip(a, b))


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 7, 8, 71, 72, 4096])
def test_real_pipeline_equals_closed_form(doc_id):
    """PNG encode -> CRC-verified decode -> integer 4x4 pool -> dHash
    must reproduce the closed form the DuckDB oracle computes."""
    v = tile_values(doc_id)
    assert v.shape == (GRID_ROWS, GRID_COLS)
    bands = dhash_bands_from_png(encode_tile_png(v))
    assert bands == _bands_closed_form(v)
    assert all(0 <= b < 1 << 16 for b in bands)


def test_perturbation_moves_at_most_two_bits():
    """One perturbed tile touches two adjacent comparisons at most."""
    for g in range(20):
        base = _bands_closed_form(tile_values(4 * g))
        for off in range(1, 4):
            other = _bands_closed_form(tile_values(4 * g + off))
            assert _hamming(base, other) <= 4  # 2 tiles x <=2 bits


def test_banding_theorem_hamming_le_3_shares_a_band():
    """Pigeonhole: any pair at Hamming distance <= 3 must agree on at
    least one of the 4 disjoint 16-bit bands — the completeness
    guarantee the banded equi-join relies on.  Exhaustive over all
    <=3-bit perturbations of a fixed signature."""
    import itertools

    base_bits = [(i * 37) % 2 for i in range(64)]

    def bands_of(bits):
        out = []
        for k in range(4):
            val = 0
            for j in range(16):
                val |= bits[16 * k + j] << j
            out.append(val)
        return tuple(out)

    b0 = bands_of(base_bits)
    for flips in itertools.combinations(range(64), 3):
        bits = list(base_bits)
        for f in flips:
            bits[f] ^= 1
        b1 = bands_of(bits)
        assert any(x == y for x, y in zip(b0, b1))


def test_group_members_share_base_image():
    """Docs in the same 4-group differ only at their perturbed tiles."""
    vs = [tile_values(40 + i) for i in range(4)]
    for a in range(4):
        for b in range(a + 1, 4):
            diff = np.argwhere(vs[a] != vs[b])
            assert 1 <= len(diff) <= 2
