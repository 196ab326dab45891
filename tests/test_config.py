import textwrap

import pytest

from latent_diffusion_planning_tpu.utils import config as cfglib


@pytest.fixture()
def root(tmp_path):
    (tmp_path / "agent").mkdir()
    (tmp_path / "data" / "rm_lift").mkdir(parents=True)
    (tmp_path / "main.yaml").write_text(textwrap.dedent("""
        defaults:
          agent: dp
          data: rm_lift/img
        batch_size: 256
        horizon: 16
        pred_horizon: ${eval:'${horizon} - 1'}
        run_name: run_${horizon}
    """))
    (tmp_path / "agent" / "dp.yaml").write_text(textwrap.dedent("""
        name: dp
        lr: 1.0e-4
        horizon: ${horizon}
    """))
    (tmp_path / "agent" / "ldp.yaml").write_text(textwrap.dedent("""
        name: ldp
        lr: 3.0e-4
    """))
    (tmp_path / "data" / "rm_lift" / "img.yaml").write_text(textwrap.dedent("""
        name: rm_lift_img
        batch_size: ${batch_size}
    """))
    return tmp_path


def test_compose_and_interpolate(root):
    cfg = cfglib.load_config("main", config_root=root)
    assert cfg.agent.name == "dp"
    assert cfg.agent.lr == 1.0e-4
    assert cfg.agent.horizon == 16
    assert cfg.data.batch_size == 256
    assert cfg.pred_horizon == 15
    assert cfg.run_name == "run_16"


def test_group_swap_and_overrides(root):
    cfg = cfglib.load_config(
        "main", overrides=["agent=ldp", "batch_size=32", "agent.lr=1e-5",
                           "+extra.nested=7"], config_root=root)
    assert cfg.agent.name == "ldp"
    assert cfg.agent.lr == 1e-5
    assert cfg.data.batch_size == 32
    assert cfg.extra.nested == 7
    assert cfg._groups_.agent == "ldp"


def test_override_parsing_types(root):
    cfg = cfglib.load_config(
        "main", overrides=["a=null", "b=true", "c=[1,2]", "d=hello"],
        config_root=root)
    assert cfg.a is None and cfg.b is True and cfg.c == [1, 2] and cfg.d == "hello"


def test_instantiate():
    cfg = cfglib._configify({
        "_target_": "collections.OrderedDict",
        "items": [["a", 1]],
    })
    # _target_ with kwargs override
    obj = cfglib.instantiate({"_target_": "fractions.Fraction",
                              "numerator": 3, "denominator": 4})
    import fractions
    assert obj == fractions.Fraction(3, 4)


def test_instantiate_partial():
    fn = cfglib.instantiate({"_target_": "fractions.Fraction",
                             "_partial_": True, "denominator": 2})
    assert fn(numerator=1).denominator == 2


def test_eval_resolver_safety(root):
    with pytest.raises(cfglib.ConfigError):
        cfglib._safe_eval("__import__('os')")


def test_roundtrip_json(root):
    cfg = cfglib.load_config("main", config_root=root)
    back = cfglib.config_from_json(cfglib.config_to_json(cfg))
    assert back.agent.name == cfg.agent.name
    assert back.to_dict() == cfg.to_dict()


def test_mixed_data_group_alias():
    """`mixed_data=` group swaps select from the data/ library
    (GROUP_DIR_ALIASES — regression: the first end-to-end mixed run crashed
    because the group name was used verbatim as the directory)."""
    cfg = cfglib.load_config(
        "train_mixed_bc",
        ["mixed_data=lift/mixed_latent_img",
         "mixed_data.train_n_episode_overfit=[8,null]"])
    assert cfg._groups_["mixed_data"] == "lift/mixed_latent_img"
    assert list(cfg.mixed_data.train_n_episode_overfit) == [8, None]
    # and the actionfree composition: mixed_data group can point at the
    # plain latent config (train_mixed_bc_actionfree parity)
    cfg2 = cfglib.load_config("train_mixed_bc_actionfree", [])
    assert "mixed_data" in cfg2
