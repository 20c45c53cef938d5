"""Config system tests: HOCON-subset parsing against the reference's own conf
files, two-file layering, and schema mapping."""

import os

import pytest

from monosdf_tpu.config import build_configs, merge_configs, parse_hocon, parse_hocon_file

REF_CONF = "/root/reference/code/confs/mp.conf"


SAMPLE = """
train{
    expname = demo
    learning_rate = 5.0e-4   # comment
    max_total_iters=4000000
}
plot{
    grid_boundary = [-1.1, 1.1]
}
model{
    Grid_MLP = True
    implicit_network
    {
        dims = [256, 256]
        skip_in = [4]
        inside_outside = True
    }
    density
    {
        params_init{
            beta = 0.1
        }
        beta_min = 0.0001
    }
}
"""


class TestHocon:
    def test_parse_sample(self):
        conf = parse_hocon(SAMPLE)
        assert conf["train"]["expname"] == "demo"
        assert conf["train"]["learning_rate"] == 5.0e-4
        assert conf["train"]["max_total_iters"] == 4000000
        assert conf["plot"]["grid_boundary"] == [-1.1, 1.1]
        assert conf["model"]["Grid_MLP"] is True
        assert conf["model"]["implicit_network"]["dims"] == [256, 256]
        assert conf["model"]["density"]["params_init"]["beta"] == 0.1

    @pytest.mark.skipif(not os.path.exists(REF_CONF), reason="no reference")
    def test_parse_reference_confs(self):
        import glob

        n_parsed = 0
        for path in sorted(glob.glob("/root/reference/code/confs/*.conf"))[:30]:
            conf = parse_hocon_file(path)
            # scene confs are overlays: at minimum a train or dataset section
            assert conf and ("train" in conf or "dataset" in conf), path
            n_parsed += 1
        assert n_parsed > 0

    def test_merge(self):
        base = parse_hocon(SAMPLE)
        overlay = parse_hocon("train{ expname = other }\nmodel{ Grid_MLP = False }")
        merged = merge_configs(base, overlay)
        assert merged["train"]["expname"] == "other"
        assert merged["train"]["learning_rate"] == 5.0e-4  # preserved
        assert merged["model"]["Grid_MLP"] is False
        assert merged["model"]["implicit_network"]["dims"] == [256, 256]

    def test_bare_dotted_string(self):
        conf = parse_hocon("train{ model_class = model.network.MonoSDFNetwork }")
        assert conf["train"]["model_class"] == "model.network.MonoSDFNetwork"


class TestSchema:
    @pytest.mark.skipif(not os.path.exists(REF_CONF), reason="no reference")
    def test_build_from_reference_conf(self):
        conf = parse_hocon_file(REF_CONF)
        exp = build_configs(conf)
        assert exp.expname == "kitchen_HDR_grids"
        assert exp.model.implicit.use_grid is True
        assert exp.model.implicit.divide_factor == 1.1
        assert exp.model.implicit.inside_outside is True
        assert exp.model.rendering.multires_view == 4
        assert exp.model.rendering.if_hdr is True  # dataset.if_hdr propagates
        assert exp.model.sampler.N_samples == 64
        assert exp.model.sampler.N_samples_eval == 128
        assert exp.model.beta_init == 0.1
        assert exp.loss.if_gamma_loss is True
        assert exp.loss.rgb_loss == "l1"
        assert exp.optim.lr_factor_for_grid == 20.0
        assert exp.optim.grid_mode is True
        assert exp.num_pixels == 1024
        assert exp.max_total_iters == 4000000

    def test_defaults(self):
        exp = build_configs(parse_hocon("train{expname = x}"))
        assert exp.model.implicit.use_grid is False
        assert exp.loss.if_scale_invariant_depth is True
        assert exp.model.mixed_precision is False
        assert exp.model.diff_backend == "jnp"

    def test_tpu_section(self):
        exp = build_configs(parse_hocon(
            "train{expname = x}\n"
            "tpu{ mixed_precision = True\n compute_dtype = bfloat16\n"
            " sampler_backend = pallas\n diff_backend = pallas }"
        ))
        assert exp.model.mixed_precision is True
        assert exp.model.compute_dtype == "bfloat16"
        assert exp.model.sampler_backend == "pallas"
        assert exp.model.diff_backend == "pallas"
