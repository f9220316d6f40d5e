"""End-to-end smoke test: synthetic scene -> train steps -> eval -> resume."""

import jax
import numpy as np
import pytest

from endosurf_tpu.data.scene_data import SceneData, make_synthetic_scene
from endosurf_tpu.train.trainer_endosurf import EndoSurfTrainer


def tiny_cfg(exp_dir, n_iter=6):
    return {
        "exp": {"project_name": "test", "exp_name": "smoke",
                "exp_dir": exp_dir, "seed": 0},
        "render": {"type": "endosurf", "anneal_end": 50, "n_samples": 8,
                   "n_importance": 8, "important_begin_iter": 0,
                   "up_sample_steps": 2, "perturb": True},
        "train": {
            "n_iter": n_iter, "ray_batch": 32,
            "mask_guided_ray_sampling": True,
            "color_loss_weight": 1.0, "depth_loss_weight": 1.0,
            "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
            "eikonal_loss_weight": 0.1, "surf_neig_loss_weight": 0.1,
            "surf_neig_rad": 0.1, "resume": False,
            "optim": {"lr": 5e-4, "lr_alpha": 0.05, "warm_up_end": 3},
            "eval": {"ray_chunk": 256},
        },
        "net": {
            "bound": 1.0, "use_deform": True,
            "deform_network": {
                "enc_pos_cfg": {"multires": 2}, "enc_time_cfg": {"multires": 2},
                "n_layers": 3, "hidden_dim": 64, "skips": [1], "out_dim": 3},
            "sdf_network": {
                "enc_pos_cfg": {"multires": 2}, "n_layers": 3,
                "hidden_dim": 64, "skips": [1], "out_dim": 33,
                "geometric_init": True, "geometric_init_bias": 0.5},
            "color_network": {
                "enc_pos_cfg": {"multires": 2}, "enc_dir_cfg": {"multires": 2},
                "n_layers": 2, "hidden_dim": 64, "skips": [], "feat_dim": 32,
                "out_dim": 3},
            "deviation_network": {"init_val": 0.3},
        },
        "log": {"i_eval": 0, "i_save": 3},
        "demo": {"fps": 10, "ray_batch": 256, "net_chunk": 4096,
                 "marching_cubes_resolution": 32, "marching_cubes_thresh": 0},
    }


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene")
    pkl = make_synthetic_scene(str(d), n_frames=4, h=20, w=24)
    return SceneData.load(pkl)


def test_train_steps_and_checkpoint(tmp_path, scene):
    cfg = tiny_cfg(str(tmp_path))
    trainer = EndoSurfTrainer(cfg, mode="train", scene=scene)

    m1 = trainer.train_step(1)
    assert np.isfinite(m1["loss_total"])
    for k in ("loss_color", "loss_depth", "loss_sdf", "loss_angle",
              "loss_eikonal", "loss_surf_neig", "psnr_color", "s_val"):
        assert k in m1, k
    p_before = np.asarray(
        trainer.params["sdf_network"]["layers"][0]["v"]).copy()
    m2 = trainer.train_step(2)
    assert np.isfinite(m2["loss_total"])
    p_after = np.asarray(trainer.params["sdf_network"]["layers"][0]["v"])
    assert not np.allclose(p_before, p_after)  # params actually move

    # Checkpoint roundtrip with backup semantics.
    from endosurf_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    save_checkpoint(trainer.exp_dir, 2, trainer.params, trainer.opt_state)
    save_checkpoint(trainer.exp_dir, 3, trainer.params, trainer.opt_state)
    restored = load_checkpoint(trainer.exp_dir, trainer.opt_state)
    assert restored["n_iter"] == 3
    np.testing.assert_allclose(
        np.asarray(restored["params"]["sdf_network"]["layers"][0]["v"]),
        p_after)
    # opt_state pytree structure survives (optax NamedTuples).
    assert jax.tree_util.tree_structure(restored["opt_state"]) == \
        jax.tree_util.tree_structure(trainer.opt_state)


def test_full_loop_with_eval(tmp_path, scene):
    cfg = tiny_cfg(str(tmp_path), n_iter=4)
    cfg["log"] = {"i_eval": 4, "i_save": 4}
    trainer = EndoSurfTrainer(cfg, mode="train", scene=scene)
    trainer.start(log_every=1)
    import os.path as osp
    assert osp.exists(osp.join(trainer.exp_dir, "ckpt"))
    assert osp.exists(osp.join(trainer.exp_dir, "cfg.yml"))
    # Eval artifacts written.
    import glob
    evals = glob.glob(osp.join(trainer.exp_dir, "eval", "*", "stats_out.txt"))
    assert evals
    stats = open(evals[0]).read()
    assert "psnr_rgb_vr" in stats and "rmse_d_vr" in stats


def test_resume(tmp_path, scene):
    cfg = tiny_cfg(str(tmp_path), n_iter=3)
    cfg["log"] = {"i_eval": 0, "i_save": 3}
    t1 = EndoSurfTrainer(cfg, mode="train", scene=scene)
    t1.start(log_every=100)
    cfg2 = tiny_cfg(str(tmp_path), n_iter=5)
    cfg2["train"]["resume"] = True
    cfg2["log"] = {"i_eval": 0, "i_save": 5}
    t2 = EndoSurfTrainer(cfg2, mode="train", scene=scene)
    assert t2.step_start == 4


def test_loss_decreases(tmp_path, scene):
    """~60 steps on the tiny model must show a real downward loss trend."""
    cfg = tiny_cfg(str(tmp_path), n_iter=60)
    cfg["train"]["optim"]["warm_up_end"] = 5
    trainer = EndoSurfTrainer(cfg, mode="train", scene=scene)
    losses = []
    for step in range(1, 61):
        m = trainer.train_step(step)
        losses.append(float(np.asarray(m["loss_total"])))
    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    assert last < 0.8 * first, (first, last)


def test_steps_per_call_window_matches_sequential(scene):
    """K steps scanned inside one dispatch must equal K sequential calls of
    the K=1 step bit-for-bit given the same key-derivation chain."""
    import jax.numpy as jnp
    import optax

    from endosurf_tpu.models.endosurf import RenderSpec
    from endosurf_tpu.models.fields import (EndoSurfSpec, MLPSpec,
                                            init_endosurf_params)
    from endosurf_tpu.train.schedules import warmup_cosine
    from endosurf_tpu.train.trainer_endosurf import make_train_step

    spec = EndoSurfSpec(
        deform_pos_freqs=2, deform_time_freqs=2, sdf_pos_freqs=2,
        color_pos_freqs=2, color_dir_freqs=2,
        deform=MLPSpec(2, 32, (), 3), sdf=MLPSpec(2, 32, (), 17),
        color=MLPSpec(2, 32, (), 3), color_feat_dim=16)
    rspec = RenderSpec(n_samples=4, n_importance=4, up_sample_steps=2,
                       anneal_end=10.0)
    tx = optax.adam(warmup_cosine(5e-4, 5, 100, 0.05))
    lw = {"color_loss_weight": 1.0, "depth_loss_weight": 1.0,
          "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
          "eikonal_loss_weight": 0.1, "surf_neig_loss_weight": 0.1}
    arrays = scene.device_arrays
    args = (spec, rspec, tx, scene.h, scene.w, 16, lw)
    K = 3

    def init():
        p = init_endosurf_params(jax.random.PRNGKey(0), spec)
        return p, tx.init(p)

    # Sequential K=1 calls with the window's exact key chain.
    fn1 = make_train_step(*args, surf_neig_rad=0.1)
    p1, o1 = init()
    key = jax.random.PRNGKey(7)
    for i in range(K):
        key, k = jax.random.split(key)
        p1, o1, m1 = fn1(p1, o1, arrays, k, jnp.asarray(float(1 + i)))

    fnK = make_train_step(*args, surf_neig_rad=0.1, steps_per_call=K)
    pK, oK = init()
    pK, oK, mK = fnK(pK, oK, arrays, jax.random.PRNGKey(7),
                     jnp.asarray(1.0))

    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(pK)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(float(np.asarray(m1["loss_total"])),
                               float(np.asarray(mK["loss_total"])),
                               rtol=1e-6)


def test_steps_per_call_trainer_loop(tmp_path, scene):
    """Trainer loop at steps_per_call=3: cadences land, tail windows work,
    resume sees the right step."""
    import glob
    import os.path as osp

    cfg = tiny_cfg(str(tmp_path), n_iter=6)
    cfg["train"]["steps_per_call"] = 3
    cfg["log"] = {"i_eval": 6, "i_save": 3}
    tr = EndoSurfTrainer(cfg, mode="train", scene=scene)
    tr.start(log_every=3, stop_after=4)   # windows [1-3], [4] (tail)
    assert tr.step_start == 5
    tr.start(log_every=3)                 # windows [5-6] -> tail size 2
    assert tr.step_start == 7
    assert osp.exists(osp.join(tr.exp_dir, "ckpt"))
    # eval fired for the n_iter boundary (label 6).
    assert glob.glob(osp.join(tr.exp_dir, "eval", "iter_00000006",
                              "stats_out.txt"))

    cfg2 = tiny_cfg(str(tmp_path), n_iter=6)
    cfg2["train"]["steps_per_call"] = 3
    cfg2["train"]["resume"] = True
    tr2 = EndoSurfTrainer(cfg2, mode="train", scene=scene)
    assert tr2.step_start == 7  # checkpoint saved at the true last step


def test_eval_fires_at_exact_step_at_k_gt_1(tmp_path, scene):
    """At steps_per_call=5 with i_eval=3 (NOT divisible), evals must fire at
    their exact step, before that step trains — eval steps split the
    dispatch window (VERDICT r2 item 7). Loop-semantics only: the step and
    eval bodies are stubbed, so no compilation happens."""
    cfg = tiny_cfg(str(tmp_path), n_iter=10)
    cfg["train"]["steps_per_call"] = 5
    cfg["log"] = {"i_eval": 3, "i_save": 0}
    tr = EndoSurfTrainer(cfg, mode="train", scene=scene)

    trained, evals = [], []

    def stub_window(step, kk):
        trained.extend(range(step, step + kk))
        return {"loss_total": 0.0}

    tr.train_step_window = stub_window
    tr.eval = lambda step: evals.append((step, len(trained)))
    tr.start(log_every=1000)

    assert trained == list(range(1, 11))
    # Eval steps: 1 (start), multiples of 3, and n_iter — each fired when
    # exactly step-1 steps had trained (i.e. BEFORE its own step).
    assert evals == [(1, 0), (3, 2), (6, 5), (9, 8), (10, 9)]


def test_precision_coupled_defaults(tmp_path, scene):
    """Shipping coupling: bf16 matmuls -> bf16 interior + linearize;
    strict-parity "highest" keeps the f32 interior + jacfwd."""
    import endosurf_tpu.models.fields as fields
    import endosurf_tpu.ops.mlp as mlp

    cfg = tiny_cfg(str(tmp_path / "a"), n_iter=2)
    EndoSurfTrainer(cfg, mode="train", scene=scene)
    assert mlp._ACTIVATION_DTYPE is not None
    assert fields._DEFORM_JAC_MODE == "linearize"

    cfg = tiny_cfg(str(tmp_path / "b"), n_iter=2)
    cfg["train"]["matmul_precision"] = "highest"
    EndoSurfTrainer(cfg, mode="train", scene=scene)
    assert mlp._ACTIVATION_DTYPE is None
    assert fields._DEFORM_JAC_MODE == "jacfwd"
    # (the autouse conftest fixture restores the globals)


def test_bf16_activation_storage_trains(tmp_path, scene):
    """activation_dtype=bfloat16 (narrow MLP interior): the full six-loss
    step stays finite, params move, and the global knob is restored."""
    from endosurf_tpu.ops.mlp import set_activation_dtype
    cfg = tiny_cfg(str(tmp_path), n_iter=3)
    cfg["train"]["activation_dtype"] = "bfloat16"
    trainer = EndoSurfTrainer(cfg, mode="train", scene=scene)
    try:
        p_before = np.asarray(
            trainer.params["sdf_network"]["layers"][0]["v"]).copy()
        for step in (1, 2, 3):
            m = trainer.train_step(step)
            assert np.isfinite(float(np.asarray(m["loss_total"])))
        p_after = np.asarray(trainer.params["sdf_network"]["layers"][0]["v"])
        assert not np.allclose(p_before, p_after)
        assert p_after.dtype == np.float32  # master params stay wide
    finally:
        set_activation_dtype(None)


def test_static_variant_trains(tmp_path, scene):
    """use_deform False (SCARED-style configs): step runs, grads flow."""
    cfg = tiny_cfg(str(tmp_path), n_iter=2)
    cfg["net"]["use_deform"] = False
    trainer = EndoSurfTrainer(cfg, mode="train", scene=scene)
    assert "deform_network" not in trainer.params
    m = trainer.train_step(1)
    assert np.isfinite(float(np.asarray(m["loss_total"])))


def test_static_scene_learns(tmp_path, tmp_path_factory):
    """SCARED-style static vertical (use_deform False, deform_amp 0,
    multi-view): the loss must show a real downward trend — learning
    evidence beyond the 2-step smoke above."""
    d = tmp_path_factory.mktemp("static_scene")
    pkl = make_synthetic_scene(str(d), n_frames=4, h=20, w=24,
                               deform_amp=0.0, orbit_deg=20.0)
    static_scene = SceneData.load(pkl)
    cfg = tiny_cfg(str(tmp_path), n_iter=60)
    cfg["net"]["use_deform"] = False
    cfg["train"]["optim"]["warm_up_end"] = 5
    trainer = EndoSurfTrainer(cfg, mode="train", scene=static_scene)
    losses = []
    for step in range(1, 61):
        m = trainer.train_step(step)
        losses.append(float(np.asarray(m["loss_total"])))
    assert np.mean(losses[-10:]) < 0.8 * np.mean(losses[:10]), (
        np.mean(losses[:10]), np.mean(losses[-10:]))


def test_ablation_zero_weights_compile_out(tmp_path, scene):
    cfg = tiny_cfg(str(tmp_path), n_iter=2)
    cfg["train"]["surf_neig_loss_weight"] = 0.0
    cfg["train"]["sdf_loss_weight"] = 0.0
    cfg["train"]["angle_loss_weight"] = 0.0
    trainer = EndoSurfTrainer(cfg, mode="train", scene=scene)
    m = trainer.train_step(1)
    assert m["loss_surf_neig"] == 0.0
    assert np.isfinite(m["loss_total"])


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


def test_stop_after_pause_and_resume(tmp_path, scene):
    """start(stop_after=k) checkpoints at k; a fresh resume=True trainer
    picks up at k+1 and finishes — the chunked long-run contract."""
    cfg = tiny_cfg(str(tmp_path), n_iter=5)
    tr = EndoSurfTrainer(cfg, mode="train", scene=scene)
    tr.start(log_every=100, stop_after=2)
    assert tr.step_start == 3

    cfg2 = tiny_cfg(str(tmp_path), n_iter=5)
    cfg2["train"]["resume"] = True
    tr2 = EndoSurfTrainer(cfg2, mode="train", scene=scene)
    assert tr2.step_start == 3
    tr2.start(log_every=100)
    assert tr2.step_start == 6

    cfg3 = tiny_cfg(str(tmp_path), n_iter=5)
    cfg3["train"]["resume"] = True
    tr3 = EndoSurfTrainer(cfg3, mode="train", scene=scene)
    assert tr3.step_start == 6  # nothing left to do


def test_deform_lr_mult(scene, tmp_path_factory):
    """optim.deform_lr_mult scales only the deform net's effective LR
    (capacity-sweep knob; 1.0 == reference's single shared Adam)."""
    import jax

    def first_steps(mult, exp_dir):
        cfg = tiny_cfg(str(exp_dir), n_iter=4)
        if mult is not None:
            cfg["train"]["optim"]["deform_lr_mult"] = mult
        trainer = EndoSurfTrainer(cfg, mode="train", scene=scene)
        p0 = jax.tree_util.tree_map(np.asarray, trainer.params)
        trainer.train_step(1)
        p1 = jax.tree_util.tree_map(np.asarray, trainer.params)
        delta = jax.tree_util.tree_map(lambda a, b: b - a, p0, p1)
        return (float(np.linalg.norm(np.concatenate([
                    np.ravel(x) for x in jax.tree_util.tree_leaves(
                        delta["deform_network"])]))),
                float(np.linalg.norm(np.concatenate([
                    np.ravel(x) for x in jax.tree_util.tree_leaves(
                        delta["sdf_network"])]))))

    d1, s1 = first_steps(None, tmp_path_factory.mktemp("m1"))
    d2, s2 = first_steps(2.0, tmp_path_factory.mktemp("m2"))
    # Adam's first step moves every param by ~lr * sign-ish magnitude:
    # doubling the deform LR should ~double the deform update and leave
    # the sdf update unchanged.
    assert 1.7 < d2 / d1 < 2.3
    np.testing.assert_allclose(s2, s1, rtol=1e-5)


def test_fold_aux_queries_matches_unfolded(scene):
    """fold_aux batches the error_on_depth / surface-neighbour field
    queries into render_core's fused evaluation; the losses must match the
    separate-query path (identical math, different program structure)."""
    import jax.numpy as jnp
    import optax

    from endosurf_tpu.models.endosurf import RenderSpec
    from endosurf_tpu.models.fields import (EndoSurfSpec, MLPSpec,
                                            init_endosurf_params)
    from endosurf_tpu.train.schedules import warmup_cosine
    from endosurf_tpu.train.trainer_endosurf import make_train_step

    spec = EndoSurfSpec(
        deform_pos_freqs=2, deform_time_freqs=2, sdf_pos_freqs=2,
        color_pos_freqs=2, color_dir_freqs=2,
        deform=MLPSpec(2, 32, (), 3), sdf=MLPSpec(2, 32, (), 17),
        color=MLPSpec(2, 32, (), 3), color_feat_dim=16)
    rspec = RenderSpec(n_samples=4, n_importance=4, up_sample_steps=2,
                       anneal_end=10.0)
    tx = optax.adam(warmup_cosine(5e-4, 5, 100, 0.05))
    lw = {"color_loss_weight": 1.0, "depth_loss_weight": 1.0,
          "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
          "eikonal_loss_weight": 0.1, "surf_neig_loss_weight": 0.1}
    params0 = init_endosurf_params(jax.random.PRNGKey(0), spec)

    res = {}
    for fold in (False, True):
        # march_reuse pinned OFF on both sides: fold_aux forces the march
        # chain (its surf queries trace before the render), so with the
        # round-5 reuse default the unfolded side would localize the
        # surface differently and the comparison would no longer isolate
        # fold_aux's program restructuring.
        step_fn = make_train_step(
            spec, rspec, tx, scene.h, scene.w, 32, lw, surf_neig_rad=0.1,
            remat=False, fold_aux=fold, march_reuse=False)
        import jax.numpy as jnp
        p = jax.tree_util.tree_map(jnp.array, params0)
        o = tx.init(p)
        key = jax.random.PRNGKey(7)
        ms = []
        for i in range(3):
            key, k = jax.random.split(key)
            p, o, m = step_fn(p, o, scene.device_arrays, k,
                              jnp.asarray(float(i + 1)))
            ms.append({kk: float(np.asarray(v)) for kk, v in m.items()})
        res[fold] = ms
    for i in range(3):
        for k, va in res[False][i].items():
            vb = res[True][i][k]
            assert abs(va - vb) <= 2e-5 + 1e-4 * abs(va), (i, k, va, vb)


def test_march_reuse_step_tracks_march(scene):
    """surf_march_reuse localizes the surface on the render's own importance
    samples instead of the fresh sphere trace. The losses are not
    bit-identical (localization differs by the sub-interval interpolation
    delta) but every term must track the march path closely from the same
    params/keys."""
    import jax.numpy as jnp
    import optax

    from endosurf_tpu.models.endosurf import RenderSpec
    from endosurf_tpu.models.fields import (EndoSurfSpec, MLPSpec,
                                            init_endosurf_params)
    from endosurf_tpu.train.schedules import warmup_cosine
    from endosurf_tpu.train.trainer_endosurf import make_train_step

    spec = EndoSurfSpec(
        deform_pos_freqs=2, deform_time_freqs=2, sdf_pos_freqs=2,
        color_pos_freqs=2, color_dir_freqs=2,
        deform=MLPSpec(2, 32, (), 3), sdf=MLPSpec(2, 32, (), 17),
        color=MLPSpec(2, 32, (), 3), color_feat_dim=16)
    rspec = RenderSpec(n_samples=4, n_importance=4, up_sample_steps=2,
                       anneal_end=10.0)
    tx = optax.adam(warmup_cosine(5e-4, 5, 100, 0.05))
    lw = {"color_loss_weight": 1.0, "depth_loss_weight": 1.0,
          "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
          "eikonal_loss_weight": 0.1, "surf_neig_loss_weight": 0.1}
    params0 = init_endosurf_params(jax.random.PRNGKey(0), spec)

    res = {}
    for reuse in (False, True):
        # The toy config has only 8 samples/ray, so pure crossing-pair
        # interpolation is far coarser than the march's 128 proposals —
        # secant refinement closes that gap (at the flagship 128-sample
        # config tests/test_renderer.py shows 5e-3 agreement unrefined).
        step_fn = make_train_step(
            spec, rspec, tx, scene.h, scene.w, 32, lw, surf_neig_rad=0.1,
            remat=False, march_reuse=reuse, march_reuse_secant=8)
        p = jax.tree_util.tree_map(jnp.array, params0)
        o = tx.init(p)
        key = jax.random.PRNGKey(7)
        ms = []
        for i in range(3):
            key, k = jax.random.split(key)
            p, o, m = step_fn(p, o, scene.device_arrays, k,
                              jnp.asarray(float(i + 1)))
            ms.append({kk: float(np.asarray(v)) for kk, v in m.items()})
        res[reuse] = ms
    for i in range(3):
        for k, va in res[False][i].items():
            vb = res[True][i][k]
            assert np.isfinite(vb), (i, k)
            if k == "loss_surf_neig":
                # At 8 samples/ray the reuse brackets occasionally pick a
                # different (equally real) first crossing than the 128
                # uniform proposals on marginal rays, and with ~5 valid
                # rays/batch one flip moves this masked mean a lot. Demand
                # the same order of magnitude here; the flagship-resolution
                # agreement is asserted in tests/test_renderer.py (5e-3 on
                # depth, 2e-3 on the error term, unrefined).
                assert 0.3 * va <= vb <= 3.0 * va + 1e-4, (i, k, va, vb)
            else:
                assert abs(va - vb) <= 1e-3 + 5e-2 * abs(va), (i, k, va, vb)


def test_presample_window_parity(scene):
    """presample hoists the window's K batch samples into one vmapped
    gather phase before the scan. The key chain reproduces the scan's
    splits exactly, so the SAMPLED RAYS are identical — but the two step
    programs are distinct XLA compilations, so fusion/reassociation may
    differ in the last ulp (observed: 1/640 params off by 4e-9 under CPU
    suite load). Assert tight allclose, not bit-equality."""
    import jax.numpy as jnp
    import optax

    from endosurf_tpu.models.endosurf import RenderSpec
    from endosurf_tpu.models.fields import (EndoSurfSpec, MLPSpec,
                                            init_endosurf_params)
    from endosurf_tpu.train.schedules import warmup_cosine
    from endosurf_tpu.train.trainer_endosurf import make_train_step

    spec = EndoSurfSpec(
        deform_pos_freqs=2, deform_time_freqs=2, sdf_pos_freqs=2,
        color_pos_freqs=2, color_dir_freqs=2,
        deform=MLPSpec(2, 32, (), 3), sdf=MLPSpec(2, 32, (), 17),
        color=MLPSpec(2, 32, (), 3), color_feat_dim=16)
    rspec = RenderSpec(n_samples=4, n_importance=4, up_sample_steps=2,
                       anneal_end=10.0)
    tx = optax.adam(warmup_cosine(5e-4, 5, 100, 0.05))
    lw = {"color_loss_weight": 1.0, "depth_loss_weight": 1.0,
          "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
          "eikonal_loss_weight": 0.1, "surf_neig_loss_weight": 0.1}
    params0 = init_endosurf_params(jax.random.PRNGKey(0), spec)

    got = {}
    for pre in (False, True):
        step_fn = make_train_step(
            spec, rspec, tx, scene.h, scene.w, 32, lw, surf_neig_rad=0.1,
            remat=False, steps_per_call=4, presample=pre)
        p = jax.tree_util.tree_map(jnp.array, params0)
        o = tx.init(p)
        p, o, m = step_fn(p, o, scene.device_arrays, jax.random.PRNGKey(7),
                          jnp.asarray(1.0))
        got[pre] = (p, float(np.asarray(m["loss_total"])))
    np.testing.assert_allclose(got[False][1], got[True][1], rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(got[False][0]),
                    jax.tree_util.tree_leaves(got[True][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-6, atol=1e-8)
