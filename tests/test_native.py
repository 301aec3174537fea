"""Native host-runtime tests: C++ inspectors vs numpy oracles, and
Matrix Market IO round-trips."""

import numpy as np
import pytest

from spblas_tpu import native
from spblas_tpu.utils.generate import generate_csr
from spblas_tpu.utils.io import load_matrix_market, save_matrix_market


def _np_csr(m, n, nnz, seed):
    a = generate_csr(m, n, nnz, seed=seed)
    return (np.asarray(a.rowptr).astype(np.int64),
            np.asarray(a.colind), np.asarray(a.values), int(a.nnz), a)


def test_native_lib_builds():
    assert native.get_lib() is not None, "C++ host runtime failed to build"


@pytest.mark.parametrize("m,n,nnz", [(50, 40, 300), (200, 200, 2000)])
def test_ell_geometry_parity(m, n, nnz):
    rowptr, colind, values, k, _ = _np_csr(m, n, nnz, seed=3)
    gather, cols, valid, w = native.ell_geometry(m, m, k, rowptr, colind)
    lengths = np.diff(np.minimum(rowptr, k))
    assert w == lengths.max()
    assert valid.sum() == k
    # every live slot points at its row's own entries, in order
    for i in range(m):
        lo = rowptr[i]
        L = lengths[i]
        np.testing.assert_array_equal(gather[i, :L], np.arange(lo, lo + L))
        np.testing.assert_array_equal(cols[i, :L], colind[lo:lo + L])
        assert not valid[i, L:].any()


def test_transpose_plan_parity():
    m, n, nnz = 60, 45, 500
    rowptr, colind, values, k, a = _np_csr(m, n, nnz, seed=4)
    t_rowptr, perm, t_colind = native.transpose_plan(m, n, k, rowptr,
                                                     colind)
    dense = np.asarray(a.todense())
    t_vals = values[perm]
    out = np.zeros((n, m), dtype=values.dtype)
    rows_t = np.repeat(np.arange(n), np.diff(t_rowptr))
    np.add.at(out, (rows_t, t_colind), t_vals)
    np.testing.assert_allclose(out, dense.T, rtol=1e-6)


def test_spgemm_symbolic_parity():
    m = k = n = 50
    ar, ac, _, ka, a = _np_csr(m, k, 400, seed=5)
    br, bc, _, kb, b = _np_csr(k, n, 400, seed=6)
    c_rowptr, total = native.spgemm_symbolic(m, n, ka, kb, ar, ac, br, bc)
    dense_c = (np.asarray(a.todense()) != 0).astype(np.int64) @ \
        (np.asarray(b.todense()) != 0).astype(np.int64)
    expected_counts = (dense_c != 0).sum(axis=1)
    np.testing.assert_array_equal(np.diff(c_rowptr), expected_counts)
    assert total == expected_counts.sum()


def test_level_schedule_chain():
    # bidiagonal lower: row i depends on i-1 → m levels
    m = 20
    rowptr = np.concatenate([[0], np.arange(1, m + 1) * 2 - 1]).astype(
        np.int64)
    cols = []
    for i in range(m):
        cols.extend([i - 1, i] if i else [0])
    colind = np.asarray(cols, np.int32)
    levels, diag, nl = native.level_schedule(
        m, int(rowptr[-1]), rowptr, colind, True, False)
    assert nl == m
    np.testing.assert_array_equal(levels, np.arange(m))


def test_level_schedule_diagonal_only():
    m = 16
    rowptr = np.arange(m + 1, dtype=np.int64)
    colind = np.arange(m, dtype=np.int32)
    levels, diag, nl = native.level_schedule(m, m, rowptr, colind, True,
                                             False)
    assert nl == 1
    assert (levels == 0).all()
    np.testing.assert_array_equal(diag, np.arange(m))


def test_level_schedule_missing_diag_raises():
    m = 3
    rowptr = np.array([0, 1, 2, 3], np.int64)
    colind = np.array([0, 0, 2], np.int32)  # row 1 has no diagonal
    with pytest.raises(ValueError):
        native.level_schedule(m, 3, rowptr, colind, True, False)
    levels, diag, nl = native.level_schedule(m, 3, rowptr, colind, True,
                                             True)
    assert diag[1] == -1


def test_matrix_market_roundtrip(tmp_path):
    a = generate_csr(30, 20, 150, seed=7)
    p = str(tmp_path / "a.mtx")
    save_matrix_market(p, a)
    b = load_matrix_market(p)
    np.testing.assert_allclose(np.asarray(b.todense()),
                               np.asarray(a.todense()), rtol=1e-6)


def test_matrix_market_symmetric(tmp_path):
    p = str(tmp_path / "s.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real symmetric\n")
        f.write("3 3 4\n1 1 2.0\n2 1 -1.0\n3 2 0.5\n3 3 4.0\n")
    a = load_matrix_market(p)
    dense = np.asarray(a.todense())
    expected = np.array([[2.0, -1.0, 0.0],
                         [-1.0, 0.0, 0.5],
                         [0.0, 0.5, 4.0]], dtype=np.float32)
    np.testing.assert_allclose(dense, expected)


def test_matrix_market_pattern_and_dups(tmp_path):
    p = str(tmp_path / "p.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern general\n")
        f.write("2 2 3\n1 1\n1 1\n2 2\n")
    a = load_matrix_market(p)
    dense = np.asarray(a.todense())
    np.testing.assert_allclose(dense, np.array([[2.0, 0], [0, 1.0]],
                                               dtype=np.float32))


def test_interop_bcoo_roundtrip():
    from spblas_tpu.utils.interop import from_bcoo, to_bcoo
    a = generate_csr(30, 25, 150, seed=8)
    back = from_bcoo(to_bcoo(a))
    np.testing.assert_allclose(np.asarray(back.todense()),
                               np.asarray(a.todense()))


def test_interop_scipy_roundtrip():
    pytest.importorskip("scipy")
    from spblas_tpu.utils.interop import from_scipy, to_scipy
    a = generate_csr(30, 25, 150, seed=9)
    back = from_scipy(to_scipy(a))
    np.testing.assert_allclose(np.asarray(back.todense()),
                               np.asarray(a.todense()))


def test_mul_expand_matches_numpy_reference():
    """Native fused expansion stream == the numpy argsort formulation
    (ops/spgemm._try_build_route fallback), including the 4-arg D tail
    (const-1 A slot, b_cap+t B slots)."""
    from spblas_tpu import native
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    for trial, (m, k, n, annz, bnnz, dnnz) in enumerate(
            [(40, 30, 35, 200, 180, 0), (25, 25, 25, 120, 120, 60)]):
        import scipy.sparse as sp
        A = sp.random(m, k, density=annz / (m * k), format="csr",
                      random_state=rng, dtype=np.float32)
        B = sp.random(k, n, density=bnnz / (k * n), format="csr",
                      random_state=rng, dtype=np.float32)
        D = (sp.random(m, n, density=dnnz / (m * n), format="csr",
                       random_state=rng, dtype=np.float32)
             if dnnz else None)
        a_rp = A.indptr.astype(np.int64)
        a_ci = A.indices.astype(np.int64)
        b_rp = B.indptr.astype(np.int64)
        b_ci = B.indices.astype(np.int64)
        a_cap, b_cap = A.nnz + 3, B.nnz + 5
        # numpy reference (the fallback path, verbatim)
        rows_a = np.repeat(np.arange(m, dtype=np.int64), np.diff(a_rp))
        cnt = b_rp[a_ci + 1] - b_rp[a_ci]
        total = int(cnt.sum())
        sa = np.repeat(np.arange(A.nnz, dtype=np.int64), cnt)
        off = np.concatenate([[0], np.cumsum(cnt)])
        sb = (np.arange(total, dtype=np.int64)
              - np.repeat(off[:-1], cnt) + np.repeat(b_rp[a_ci], cnt))
        rows = np.repeat(rows_a, cnt)
        cols = b_ci[sb]
        d_nnz = int(D.nnz) if D is not None else 0
        if D is not None:
            d_rp = D.indptr.astype(np.int64)
            d_ci = D.indices.astype(np.int64)
            rows = np.concatenate(
                [rows, np.repeat(np.arange(m, dtype=np.int64),
                                 np.diff(d_rp))])
            cols = np.concatenate([cols, d_ci])
            sa = np.concatenate([sa, np.full(d_nnz, a_cap, np.int64)])
            sb = np.concatenate(
                [sb, b_cap + np.arange(d_nnz, dtype=np.int64)])
        else:
            d_rp = d_ci = None
        order = np.argsort(rows * np.int64(n) + cols, kind="stable")
        rows, cols, sa, sb = (rows[order], cols[order], sa[order],
                              sb[order])
        head = np.empty(len(rows), bool)
        head[0] = True
        head[1:] = (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])
        slots_ref = np.cumsum(head) - 1
        nat = native.mul_expand(
            m, A.nnz, a_rp, a_ci.astype(np.int32), B.nnz, b_rp,
            b_ci.astype(np.int32), d_nnz, d_rp, d_ci, a_cap, b_cap,
            total + d_nnz)
        assert nat is not None
        slots_n, sa_n, sb_n, nnz_n = nat
        np.testing.assert_array_equal(slots_n, slots_ref)
        np.testing.assert_array_equal(sa_n, sa)
        np.testing.assert_array_equal(sb_n, sb)
        assert nnz_n == int(slots_ref[-1]) + 1


class TestSortUtil:
    """Round-4 threaded host primitives (native/src/sort_util.cpp):
    each must match its numpy reference expression exactly (the plan
    builders rely on bit-identical stable ordering)."""

    def test_argsort_matches_numpy_stable(self):
        rng = np.random.default_rng(11)
        for n in (0, 1, 7, 1000, 200_000):
            # duplicate-heavy keys exercise stability
            key = rng.integers(0, max(n // 50, 2), n) * 12345
            out = native.argsort_i64(key)
            if out is None:
                pytest.skip("native library unavailable")
            order, sk = out
            ref = np.argsort(key, kind="stable")
            np.testing.assert_array_equal(order, ref)
            np.testing.assert_array_equal(sk, key[ref])

    def test_argsort_wide_keys(self):
        rng = np.random.default_rng(12)
        key = rng.integers(0, 1 << 62, 100_000)
        order, sk = native.argsort_i64(key)
        np.testing.assert_array_equal(order,
                                      np.argsort(key, kind="stable"))

    def test_route2_keys_matches_expression(self):
        rng = np.random.default_rng(13)
        rows = rng.integers(0, 1 << 20, 50_000)
        cols = rng.integers(0, 1 << 21, 50_000)
        rw_bits, w_bits = 13, 14
        ncellc = (int(cols.max()) >> w_bits) + 1
        lvl = rng.integers(0, 64, 50_000)
        for lv, mult in ((None, 0), (lvl, 977)):
            key = native.route2_keys(rows, cols, rw_bits, w_bits,
                                     ncellc, lvl=lv, lvl_mult=mult)
            if key is None:
                pytest.skip("native library unavailable")
            cell = (rows >> rw_bits) * ncellc + (cols >> w_bits)
            if lv is not None:
                cell = cell + lv * mult
            ref = ((cell << (15 + rw_bits))
                   | ((rows & ((1 << rw_bits) - 1)) << 15)
                   | (cols & ((1 << w_bits) - 1)))
            np.testing.assert_array_equal(key, ref)

    def test_fill_group_tiles_with_spill(self):
        rng = np.random.default_rng(14)
        ng, ne = 37, 20_000
        pairs = rng.permutation(ng * 1024)[:ne]
        eg = (pairs // 1024).astype(np.int32)
        es = (pairs % 1024).astype(np.int32)
        vv = rng.random(ne).astype(np.float32)
        ee = rng.integers(-1, 500, ne)
        sp = rng.permutation(ne)[:321].astype(np.int32)
        out = native.fill_group_tiles(ng, eg, es, vv, ee, spill_idx=sp)
        if out is None:
            pytest.skip("native library unavailable")
        vt, st = out
        keep = np.ones(ne, bool)
        keep[sp] = False
        vt_ref = np.zeros((ng, 8, 128), np.float32)
        st_ref = np.full((ng, 8, 128), -1, np.int32)
        vt_ref[eg[keep], es[keep] >> 7, es[keep] & 127] = vv[keep]
        st_ref[eg[keep], es[keep] >> 7, es[keep] & 127] = \
            np.where(ee[keep] >= 0, ee[keep], -1)
        np.testing.assert_array_equal(vt, vt_ref)
        np.testing.assert_array_equal(st, st_ref)

    def test_gathers_and_expand(self):
        rng = np.random.default_rng(15)
        idx = rng.integers(0, 999, 4321).astype(np.int32)
        f = rng.random(999).astype(np.float32)
        i = rng.integers(0, 1 << 40, 999)
        t = rng.integers(0, 1 << 30, (999, 8, 128)).astype(np.int32)
        if native.gather(idx, f) is None:
            pytest.skip("native library unavailable")
        np.testing.assert_array_equal(native.gather(idx, f), f[idx])
        np.testing.assert_array_equal(native.gather(idx, i), i[idx])
        np.testing.assert_array_equal(native.gather(idx, t), t[idx])
        gp = np.array([5, -1, 0, 998, -1], np.int32)
        fill = np.full((8, 128), -9, np.int32)
        ref = t[np.maximum(gp, 0)].copy()
        ref[gp < 0] = fill
        np.testing.assert_array_equal(
            native.gather_tiles_fill(gp, t, fill), ref)
        rp = np.concatenate([[0], np.cumsum(rng.integers(0, 9, 500))])
        nnz = int(rp[-1])
        np.testing.assert_array_equal(
            native.expand_rowptr(500, nnz, rp),
            np.repeat(np.arange(500), np.diff(rp)))


class TestReviewHardening:
    """Round-4 native-layer review findings (case-insensitive MM
    banner, argsort negative-key rejection, fallback robustness)."""

    def test_mm_banner_case_insensitive(self, tmp_path):
        # the MM spec makes the banner case-insensitive; a capitalized
        # "Symmetric" silently parsed as general (dropping the mirrored
        # entries) before the fix
        p = tmp_path / "sym.mtx"
        p.write_text("%%MatrixMarket matrix coordinate real Symmetric\n"
                     "3 3 3\n1 1 2.0\n2 1 -1.5\n3 3 4.0\n")
        rows, cols, vals, shape = native.mm_read(str(p))
        assert shape == (3, 3) and len(rows) == 4
        dense = np.zeros((3, 3))
        np.add.at(dense, (rows, cols), vals)
        assert dense[0, 1] == -1.5 and dense[1, 0] == -1.5
        # pure-python fallback agrees
        r2 = native._mm_read_py(str(p))
        assert len(r2[0]) == 4

        p2 = tmp_path / "gen.mtx"
        p2.write_text("%%MatrixMarket MATRIX Coordinate Real General\n"
                      "2 2 1\n2 1 5.0\n")
        rows, cols, vals, shape = native.mm_read(str(p2))
        assert len(rows) == 1 and vals[0] == 5.0

    def test_argsort_rejects_negative_keys(self):
        if native.get_lib() is None:
            pytest.skip("native library unavailable")
        # LSD radix on two's-complement would order negatives after
        # positives; the wrapper must return None (numpy fallback)
        assert native.argsort_i64(
            np.array([5, -3, 2, -7, 9, 0], np.int64)) is None
        key = np.array([5, 3, 2, 7, 9, 0], np.int64)
        order, sk = native.argsort_i64(key)
        np.testing.assert_array_equal(order,
                                      np.argsort(key, kind="stable"))
        np.testing.assert_array_equal(sk, np.sort(key))

    def test_ell_geometry_empty_fallback(self, monkeypatch):
        # the numpy fallback indexed an empty colind even though every
        # slot was invalid (np.where evaluates both branches)
        monkeypatch.setattr(native, "get_lib", lambda: None)
        gather, cols, valid, w = native.ell_geometry(
            3, 3, 0, np.zeros(4, np.int64), np.zeros(0, np.int32))
        assert not valid.any() and cols.shape == gather.shape

    def test_gather_tiles_fill_itemsize_guard(self):
        if native.get_lib() is None:
            pytest.skip("native library unavailable")
        # f64 tiles are 8192 B; the 4096-B native memcpy must refuse
        # (None -> caller's numpy fallback), not return garbage
        t = np.arange(2 * 8 * 128, dtype=np.float64).reshape(2, 8, 128)
        fill = np.zeros((8, 128), np.float64)
        assert native.gather_tiles_fill(
            np.array([0, 1], np.int32), t, fill) is None
