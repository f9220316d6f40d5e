"""All shipped configs must load and produce valid model/render specs."""

import glob
import os.path as osp

import pytest

from endosurf_tpu.config import load_config

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
CONFIGS = sorted(glob.glob(osp.join(REPO, "configs", "**", "*.yml"),
                           recursive=True))


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: osp.relpath(p, REPO))
def test_config_builds_specs(path):
    cfg = load_config(path)
    for section in ("exp", "data", "render", "train", "net", "log", "demo"):
        assert section in cfg, f"{path} missing {section}"
    rtype = cfg["render"]["type"]
    if rtype == "endosurf":
        from endosurf_tpu.models.endosurf import RenderSpec
        from endosurf_tpu.models.fields import EndoSurfSpec
        spec = EndoSurfSpec.from_config(cfg["net"])
        rspec = RenderSpec.from_config(cfg["render"])
        assert rspec.n_importance % rspec.up_sample_steps == 0
        assert spec.sdf.out_dim == spec.color_feat_dim + 1
    elif rtype == "endonerf":
        from endosurf_tpu.models.endonerf import DNeRFRenderSpec, DNeRFSpec
        spec = DNeRFSpec.from_config(cfg["net"])
        rspec = DNeRFRenderSpec.from_config(cfg["render"])
        assert spec.geo_feat_dim > 0
    else:
        raise AssertionError(f"unknown render type {rtype}")
    # Training section sanity.
    assert cfg["train"]["n_iter"] > 0
    assert cfg["train"]["ray_batch"] > 0


def test_scene_matrix_covers_reference():
    """7 scenes x 2 models + 4 ablations + 2 test configs ship."""
    names = [osp.relpath(p, REPO) for p in CONFIGS]
    for model in ("endosurf", "endonerf"):
        for scene in ("pull", "cut", "d1k1", "d2k1", "d3k1", "d6k1", "d7k1"):
            assert f"configs/{model}/baseline/base_{scene}.yml" in names
    for abl in ("sdf", "angle", "eikonal", "surf_neig"):
        assert f"configs/endosurf/ablation/no_{abl}_loss.yml" in names
    assert "configs/endosurf/test.yml" in names
    assert "configs/endonerf/test.yml" in names


def test_ablations_zero_exactly_one_weight():
    for abl in ("sdf", "angle", "eikonal", "surf_neig"):
        cfg = load_config(osp.join(
            REPO, "configs", "endosurf", "ablation", f"no_{abl}_loss.yml"))
        assert cfg["train"][f"{abl}_loss_weight"] == 0.0
        others = {"sdf", "angle", "eikonal", "surf_neig"} - {abl}
        for o in others:
            assert cfg["train"][f"{o}_loss_weight"] != 0.0


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
