"""Guard the ceiling tools' jaxpr dot walker (tools/train_ceiling.py).

The train/serving ceiling decompositions (VALIDATION round-5) rest on the
walker counting every dot_general with the right multiplicity: scan bodies
multiply by `length`, pallas_call bodies by the grid size, precision pins
map to MXU pass counts, and `while` bodies are flagged as unpriceable
rather than silently undercounted. Each rule gets a closed-form check
against hand-counted FLOPs.
"""

import os.path as osp
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "tools"))

from train_ceiling import collect_dots, summarize  # noqa: E402


def _dots_of(fn, *args):
    dots, stats = [], {}
    collect_dots(jax.make_jaxpr(fn)(*args).jaxpr, 1, dots, stats)
    return dots, stats


def _total_model_flops(dots):
    return sum(2 * c * b * m * k * n for c, b, m, k, n, _ in dots)


def test_plain_dot_counted_once():
    a, b = jnp.ones((16, 32)), jnp.ones((32, 8))
    dots, stats = _dots_of(lambda x, y: x @ y, a, b)
    assert len(dots) == 1 and stats.get("while_eqns", 0) == 0
    assert _total_model_flops(dots) == 2 * 16 * 32 * 8


def test_scan_multiplies_by_length():
    a, b = jnp.ones((16, 32)), jnp.ones((32, 32))

    def fn(x, y):
        def body(c, _):
            return c @ y, None
        out, _ = jax.lax.scan(body, x, None, length=5)
        return out

    dots, _ = _dots_of(fn, a, b)
    assert _total_model_flops(dots) == 5 * 2 * 16 * 32 * 32


def test_fori_loop_static_bounds_priced():
    """fori_loop with static bounds must trace to a priceable form (scan)
    — the in-kernel MLP sweeps rely on this; a silent while would
    undercount the hardware inventory."""
    a, b = jnp.ones((16, 32)), jnp.ones((32, 32))

    def fn(x, y):
        return jax.lax.fori_loop(0, 7, lambda _, c: c @ y, x)

    dots, stats = _dots_of(fn, a, b)
    total = _total_model_flops(dots)
    if stats.get("while_eqns", 0):
        # Acceptable only if flagged: the tool surfaces the undercount.
        assert total == 2 * 16 * 32 * 32
    else:
        assert total == 7 * 2 * 16 * 32 * 32


def test_pallas_grid_multiplies():
    from jax.experimental import pallas as pl

    def kernel(x_ref, y_ref, o_ref):
        o_ref[...] = jnp.dot(x_ref[...], y_ref[...],
                             preferred_element_type=jnp.float32)

    def fn(x, y):
        return pl.pallas_call(
            kernel,
            grid=(4,),
            in_specs=[pl.BlockSpec((8, 32), lambda i: (i, 0)),
                      pl.BlockSpec((32, 16), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((8, 16), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((32, 16), jnp.float32),
            interpret=True,
        )(x, y)

    x, y = jnp.ones((32, 32)), jnp.ones((32, 16))
    np.testing.assert_allclose(np.asarray(fn(x, y)),
                               np.asarray(x @ y), rtol=1e-6)
    dots, stats = _dots_of(fn, x, y)
    assert stats.get("pallas_calls") == 1
    # One 8x32x16 block dot, grid=4 trips.
    assert _total_model_flops(dots) == 4 * 2 * 8 * 32 * 16


def test_while_flagged_not_silently_undercounted():
    a, b = jnp.ones((16, 32)), jnp.ones((32, 32))

    def fn(x, y):
        def cond(carry):
            i, _ = carry
            return i < y[0, 0].astype(jnp.int32)  # data-dependent bound

        def body(carry):
            i, c = carry
            return i + 1, c @ y

        _, out = jax.lax.while_loop(cond, body, (jnp.int32(0), x))
        return out

    _, stats = _dots_of(fn, a, b)
    assert stats.get("while_eqns", 0) >= 1


def test_summarize_tile_padding_and_passes():
    peak = 197e12
    # One dot: M=100, K=52, N=3, DEFAULT precision (1 pass).
    dots = [(1, 1, 100, 52, 3, 1)]
    rec = summarize(dots, peak)
    model = 2 * 100 * 52 * 3
    padded = 2 * 104 * 128 * 128
    assert rec["dot_model_gflop"] == round(model / 1e9, 2)
    assert rec["mxu_dot_padded_gflop"] == round(padded / 1e9, 2)
    assert rec["pad_factor"] == round(padded / model, 3)
    # HIGHEST precision triples... 6x the padded pass cost.
    rec6 = summarize([(1, 1, 100, 52, 3, 6)], peak)
    assert rec6["mxu_dot_padded_passes_gflop"] == round(6 * padded / 1e9, 2)
    # K*N < 128 contractions bucket as VPU, exempt from tile padding.
    recv = summarize([(1, 1, 100, 52, 2, 1)], peak)
    assert recv["mxu_dot_padded_gflop"] == 0.0
    assert recv["tiny_dot_vpu_gflop"] == round(2 * 100 * 52 * 2 / 1e9, 3)
