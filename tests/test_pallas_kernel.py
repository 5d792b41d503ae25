"""Pallas SpMM kernel correctness (interpret mode on CPU; the real-TPU run
is exercised by bench.py / experiments)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddle_sparse_tpu.ops.kernels.spmm_pallas import (segment_rows_matmul,
                                                       spmm_pallas)

rng = np.random.default_rng(5)


def _graph(M, N, nnz):
    row = np.sort(rng.integers(0, M, nnz))
    col = rng.integers(0, N, nnz)
    order = np.lexsort((col, row))
    row, col = row[order], col[order]
    rowptr = np.searchsorted(row, np.arange(M + 1))
    return row, col, rowptr


@pytest.mark.parametrize("K", [64, 128, 256])
def test_spmm_pallas_interpret(K):
    M, N, nnz = 300, 200, 4000
    row, col, rowptr = _graph(M, N, nnz)
    val = rng.standard_normal(nnz).astype(np.float32)
    x = rng.standard_normal((N, K)).astype(np.float32)

    out = spmm_pallas(jnp.asarray(rowptr, jnp.int32),
                      jnp.asarray(col, jnp.int32), jnp.asarray(val),
                      jnp.asarray(x), interpret=True)
    expected = np.zeros((M, K), np.float32)
    np.add.at(expected, row, val[:, None] * x[col])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4,
                               atol=1e-4)


def test_spmm_pallas_bf16_interpret():
    """bf16 product streams take the single-pass MXU path; accumulation is
    f32 so results match the f32 reference at bf16 input resolution."""
    M, N, K, nnz = 300, 200, 128, 4000
    row, col, rowptr = _graph(M, N, nnz)
    val = rng.standard_normal(nnz).astype(np.float32)
    x = rng.standard_normal((N, K)).astype(np.float32)
    val16 = jnp.asarray(val).astype(jnp.bfloat16)
    x16 = jnp.asarray(x).astype(jnp.bfloat16)

    out = spmm_pallas(jnp.asarray(rowptr, jnp.int32),
                      jnp.asarray(col, jnp.int32), val16, x16,
                      interpret=True)
    # uniform contract (ADVICE r1): output follows the promoted input
    # dtype; accumulation inside the kernel is still f32
    assert out.dtype == jnp.bfloat16
    out = out.astype(jnp.float32)
    expected = np.zeros((M, K), np.float64)
    np.add.at(expected, row,
              np.asarray(val16, np.float64)[:, None]
              * np.asarray(x16, np.float64)[col])
    # bf16 inputs: ~0.8% per-product rounding; rows sum ~13 products
    np.testing.assert_allclose(np.asarray(out, np.float64), expected,
                               rtol=6e-2, atol=6e-2)


def test_segment_rows_matmul_empty_rows():
    """Rows with no edges and ragged tails must come out zero."""
    M, K = 260, 64
    row = np.asarray([0, 0, 5, 259])
    products = np.ones((4, K), np.float32)
    rowptr = np.searchsorted(row, np.arange(M + 1))
    out = segment_rows_matmul(jnp.asarray(products),
                              jnp.asarray(row, jnp.int32),
                              jnp.asarray(rowptr, jnp.int32), M,
                              interpret=True)
    out_np = np.asarray(out)
    assert out_np[0, 0] == 2.0
    assert out_np[5, 0] == 1.0
    assert out_np[259, 0] == 1.0
    mask = np.ones(M, bool)
    mask[[0, 5, 259]] = False
    assert np.abs(out_np[mask]).max() == 0.0


def test_spmm_backend_pallas_grads_interpret(monkeypatch):
    """The custom-VJP pallas wrapper must match XLA gradients."""
    import paddle_sparse_tpu.ops.kernels.spmm_pallas as kmod
    import paddle_sparse_tpu.ops.spmm as smod

    # route the pallas path through interpret mode on CPU
    orig = kmod.segment_rows_matmul

    def interp(products, row, rowptr, num_rows, **kw):
        kw["interpret"] = True
        return orig(products, row, rowptr, num_rows, **kw)

    monkeypatch.setattr(smod, "_tpu_platform", lambda: False)
    import paddle_sparse_tpu.ops.kernels.spmm_pallas as _k
    monkeypatch.setattr(_k, "segment_rows_matmul", interp)

    M, N, K, nnz = 40, 30, 64, 300
    row, col, rowptr = _graph(M, N, nnz)
    val = jnp.asarray(rng.standard_normal(nnz), jnp.float32)
    x = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)
    rowj = jnp.asarray(row, jnp.int32)
    colj = jnp.asarray(col, jnp.int32)

    def loss_p(v, xx):
        return (smod.spmm_coo(rowj, colj, v, xx, M, "sum",
                              backend="pallas") ** 2).sum()

    def loss_x(v, xx):
        return (smod.spmm_coo(rowj, colj, v, xx, M, "sum",
                              backend="xla") ** 2).sum()

    gp = jax.grad(loss_p, argnums=(0, 1))(val, x)
    gx = jax.grad(loss_x, argnums=(0, 1))(val, x)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]),
                               rtol=1e-3, atol=1e-4)


def test_spmm_csr_chunked_matches_reference():
    """Chunked fused SpMM (multiple row blocks, ragged tail) == dense ref."""
    from paddle_sparse_tpu.ops.kernels.spmm_pallas import (plan_row_chunks,
                                                           spmm_csr_chunked)
    M, N, K, nnz = 700, 500, 64, 9000
    row, col, rowptr = _graph(M, N, nnz)
    val = rng.standard_normal(nnz).astype(np.float32)
    x = rng.standard_normal((N, K)).astype(np.float32)

    # Force several chunks: tiny target bytes
    CR, EC, nchunks = plan_row_chunks(rowptr, K, target_bytes=64 * 1024,
                                      tile_rows=8, chunk_edges=128)
    assert nchunks > 3
    out = spmm_csr_chunked(jnp.asarray(rowptr, jnp.int32),
                           jnp.asarray(row, jnp.int32),
                           jnp.asarray(col, jnp.int32),
                           jnp.asarray(val), jnp.asarray(x), M, CR, EC,
                           tile_rows=8, chunk_edges=128, interpret=True)
    expected = np.zeros((M, K), np.float32)
    np.add.at(expected, row, val[:, None] * x[col])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4,
                               atol=1e-4)


def test_spmm_chunked_vjp_grads():
    """Chunked custom-VJP (CSC backward + chunked SDDMM) == XLA autodiff."""
    import paddle_sparse_tpu.ops.spmm as spmm_mod
    M, N, K, nnz = 260, 180, 64, 3000
    row, col, rowptr = _graph(M, N, nnz)
    val = rng.standard_normal(nnz).astype(np.float32)
    x = rng.standard_normal((N, K)).astype(np.float32)
    row_j, col_j = jnp.asarray(row, jnp.int32), jnp.asarray(col, jnp.int32)
    val_j, x_j = jnp.asarray(val), jnp.asarray(x)

    w = jnp.asarray(rng.standard_normal(K).astype(np.float32))

    plan, structure = spmm_mod.make_spmm_plan(row_j, col_j, M, N, K,
                                              target_bytes=32 * 1024)

    def loss_chunked(v, xx):
        return (spmm_mod.spmm_chunked(plan, structure, v, xx) * w).sum()

    def loss_ref(v, xx):
        return (spmm_mod.spmm_coo(row_j, col_j, v, xx, M, "sum",
                                  backend="xla") * w).sum()

    g1 = jax.grad(loss_chunked, argnums=(0, 1))(val_j, x_j)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(val_j, x_j)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-4, atol=1e-4)


def test_spmm_chunked_as_jit_args():
    """The bench pattern: structure arrays passed as jit ARGUMENTS (not
    closures — remote-compile transports reject giant HLO constants)."""
    import paddle_sparse_tpu.ops.spmm as spmm_mod
    M, N, K, nnz = 300, 260, 64, 2500
    row, col, rowptr = _graph(M, N, nnz)
    val = rng.standard_normal(nnz).astype(np.float32)
    x = rng.standard_normal((N, K)).astype(np.float32)
    plan, structure = spmm_mod.make_spmm_plan(
        jnp.asarray(row, jnp.int32), jnp.asarray(col, jnp.int32), M, N, K,
        target_bytes=64 * 1024)

    @jax.jit
    def fwd(structure, value, x):
        return spmm_mod.spmm_chunked(plan, structure, value, x)

    @jax.jit
    def fwd_bwd(structure, value, x):
        def loss(v, xx):
            return spmm_mod.spmm_chunked(plan, structure, v, xx).sum()
        return jax.value_and_grad(loss, argnums=(0, 1))(value, x)

    out = fwd(structure, jnp.asarray(val), jnp.asarray(x))
    expected = np.zeros((M, K), np.float32)
    np.add.at(expected, row, val[:, None] * x[col])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4,
                               atol=1e-4)
    loss, (dv, dx) = fwd_bwd(structure, jnp.asarray(val), jnp.asarray(x))
    np.testing.assert_allclose(float(loss), expected.sum(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), x[col].sum(1), rtol=1e-4,
                               atol=1e-4)


def test_bf16_stream_optin(monkeypatch):
    """PSP_SPMM_STREAM=bf16 halves the gather/stream bytes at ~3 decimal
    digits of element precision; accumulation stays f32 (VERDICT r2
    item 3: bf16 stream behind an explicit opt-in, strict f32 default)."""
    # The env knob is snapshotted ONCE at import (ADVICE r3: jit caches
    # are not keyed on the environment); per-call choice goes through the
    # explicit ``stream`` argument / SpmmPlan.stream instead.
    from paddle_sparse_tpu.ops.kernels.spmm_pallas import (_product_dtype,
                                                           spmm_pallas)
    val = jnp.ones((4,), jnp.float32)
    x32 = jnp.ones((4, 8), jnp.float32)
    assert _product_dtype(val, x32, stream="bf16") == jnp.bfloat16
    assert _product_dtype(val, x32, stream="f32") == jnp.float32
    # mid-process env flips do NOT change behavior (import-time snapshot)
    monkeypatch.setenv("PSP_SPMM_STREAM", "bf16")
    assert _product_dtype(val, x32) == jnp.float32
    # f64 never drops precision regardless of the knob
    assert _product_dtype(val.astype(jnp.float64),
                          x32.astype(jnp.float64),
                          stream="bf16") == jnp.float32

    M, N, K, nnz = 120, 100, 64, 900
    row, col, rowptr = _graph(M, N, nnz)
    v = rng.standard_normal(nnz).astype(np.float32)
    x = rng.standard_normal((N, K)).astype(np.float32)
    out = spmm_pallas(jnp.asarray(rowptr, jnp.int32),
                      jnp.asarray(col, jnp.int32), jnp.asarray(v),
                      jnp.asarray(x), interpret=True, stream="bf16")
    expected = np.zeros((M, K), np.float32)
    np.add.at(expected, row, v[:, None] * x[col])
    # bf16 elements carry ~8 bits of mantissa: bound the error relative
    # to the largest output magnitude, not element-wise
    err = np.abs(np.asarray(out) - expected).max()
    assert err <= 2e-2 * np.abs(expected).max(), err
    # and it IS bf16-rounded (differs from the strict-f32 path)
    out32 = spmm_pallas(jnp.asarray(rowptr, jnp.int32),
                        jnp.asarray(col, jnp.int32), jnp.asarray(v),
                        jnp.asarray(x), interpret=True, stream="f32")
    assert np.abs(np.asarray(out32) - expected).max() < err


def test_fused_backward_multiblock():
    """spmm_sddmm_chunked: d_x and d_value in one CSC pass must match the
    XLA-path gradients when the row space spans several chunks."""
    import paddle_sparse_tpu.ops.spmm as spmm_mod
    M, N, K, nnz = 520, 410, 64, 4200
    row, col, rowptr = _graph(M, N, nnz)
    val = rng.standard_normal(nnz).astype(np.float32)
    x = rng.standard_normal((N, K)).astype(np.float32)
    g = rng.standard_normal((M, K)).astype(np.float32)
    plan, s = spmm_mod.make_spmm_plan(
        jnp.asarray(row, jnp.int32), jnp.asarray(col, jnp.int32), M, N, K,
        target_bytes=48 * 1024)   # forces several blocks both ways

    def loss(v, xx):
        return (spmm_mod.spmm_chunked(plan, s, v, xx) * g).sum()

    dv, dx = jax.grad(loss, argnums=(0, 1))(jnp.asarray(val),
                                            jnp.asarray(x))
    want_dv = (g[row] * x[col]).sum(axis=1)
    want_dx = np.zeros((N, K), np.float32)
    np.add.at(want_dx, col, val[:, None] * g[row])
    np.testing.assert_allclose(np.asarray(dv), want_dv, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(dx), want_dx, rtol=1e-4,
                               atol=1e-4)


def test_long_row_splitting_powerlaw():
    """Rows longer than the split cap are cut into pseudo-rows and folded
    back — results and gradients must match the XLA path on a graph with
    one dominating row (VERDICT r2 item 8)."""
    import paddle_sparse_tpu.ops.spmm as spmm_mod
    M, N, K = 300, 280, 64
    hot = rng.integers(0, N, 5000)             # row 0 owns 5000 edges
    rest_r = np.sort(rng.integers(1, M, 2000))
    rest_c = rng.integers(0, N, 2000)
    row = np.concatenate([np.zeros(5000, np.int64), rest_r])
    col = np.concatenate([hot, rest_c])
    order = np.lexsort((col, row))
    row, col = row[order].astype(np.int32), col[order].astype(np.int32)
    nnz = row.shape[0]
    val = rng.standard_normal(nnz).astype(np.float32)
    x = rng.standard_normal((N, K)).astype(np.float32)

    plan, s = spmm_mod.make_spmm_plan(
        jnp.asarray(row), jnp.asarray(col), M, N, K,
        target_bytes=512 * 1024)
    # the hot row must actually have been split
    assert plan.num_pseudo > M

    w = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))

    def loss_chunked(v, xx):
        return (spmm_mod.spmm_chunked(plan, s, v, xx) * w).sum()

    def loss_ref(v, xx):
        return (spmm_mod.spmm_coo(jnp.asarray(row), jnp.asarray(col), v,
                                  xx, num_rows=M, reduce="sum",
                                  backend="xla") * w).sum()

    l1, g1 = jax.value_and_grad(loss_chunked, argnums=(0, 1))(
        jnp.asarray(val), jnp.asarray(x))
    l2, g2 = jax.value_and_grad(loss_ref, argnums=(0, 1))(
        jnp.asarray(val), jnp.asarray(x))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-3, atol=1e-3)
