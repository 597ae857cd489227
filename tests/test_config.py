from paradis_tpu.config import Config, apply_overrides, default_config, load_config


def test_default_schema_matches_reference():
    cfg = default_config().resolved()
    assert cfg.model.latent_size == 1024
    assert cfg.model.num_layers == 8
    assert cfg.model.velocity_vectors == 768
    assert cfg.model.base_dt == 21600
    assert cfg.training.optimizer.name == "normuon"
    assert cfg.training.scheduler.wsd.enabled is True
    assert len(cfg.features.pressure_levels) == 13
    assert cfg.features.input.constants[-2] == "latitude"
    assert cfg.features.input.constants[-1] == "longitude"


def test_interpolation():
    cfg = default_config()
    cfg.model.forecast_steps = 4
    r = cfg.resolved()
    assert r.model.val_forecast_steps == 4


def test_overrides_parse_yaml_scalars():
    cfg = default_config()
    apply_overrides(
        cfg,
        [
            "model.num_layers=2",
            "training.optimizer.lr=1e-3",
            "compute.use_amp=false",
            "training.loss_function.type=mse",
        ],
    )
    assert cfg.model.num_layers == 2
    assert abs(cfg.training.optimizer.lr - 1e-3) < 1e-12
    assert cfg.compute.use_amp is False


def test_user_yaml_merge(tmp_path):
    p = tmp_path / "user.yaml"
    p.write_text("model:\n  latent_size: 64\n")
    cfg = load_config(p, overrides=["model.num_layers=3"])
    assert cfg.model.latent_size == 64
    assert cfg.model.num_layers == 3
    # untouched defaults survive the merge
    assert cfg.training.optimizer.name == "normuon"


def test_attribute_set_wraps_nested():
    cfg = Config()
    cfg.set_path("a.b.c", 5)
    assert cfg.a.b.c == 5
    cfg.a.b = {"d": 1}
    assert isinstance(cfg.a.b, Config)


def test_compute_platform_pin_subprocess(tmp_path):
    """compute.platform pins jax_platforms before backend init (both CLIs
    route through the same pin; exercised here via setup_system)."""
    import subprocess
    import sys

    code = """
import sys
sys.path.insert(0, "/root/repo")
from paradis_tpu.config import default_config
from paradis_tpu.utils.system import setup_system
cfg = default_config()
cfg.compute.platform = "cpu"
cfg.training.max_steps = 1
cfg = cfg.resolved()
setup_system(cfg)
import jax
assert jax.config.jax_platforms == "cpu", jax.config.jax_platforms
assert jax.default_backend() == "cpu"
print("PIN_OK")
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "PIN_OK" in out.stdout
