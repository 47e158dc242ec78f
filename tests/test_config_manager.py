"""ConfigManager tests over the shipped default configs: YAML merge, MINE pair
derivation, session dirs, schedule values, model construction for all kinds."""
from pathlib import Path

import pytest
import yaml

from etts.utils.config import ConfigManager

CONFIG_DIR = Path(__file__).parent.parent / "configs" / "default"


@pytest.fixture
def config_dir(tmp_path):
    """Copy default configs with a tmp log dir so no real dirs are touched."""
    d = tmp_path / "default"
    d.mkdir()
    for f in CONFIG_DIR.glob("*.yaml"):
        cfg = yaml.safe_load(f.read_text())
        if "log_directory" in cfg:
            cfg["log_directory"] = str(tmp_path / "ckpt")
            cfg["data_directory"] = str(tmp_path / "data")
        (d / f.name).write_text(yaml.safe_dump(cfg))
    return d


class TestConfigManager:
    def test_merge_and_session(self, config_dir):
        cm = ConfigManager(str(config_dir), "autoregressive", "sess1")
        assert cm.config["mel_channels"] == 80           # from data config
        assert cm.config["decoder_model_dimension"] == 256  # from model config
        assert cm.session_name.endswith("sess1")
        assert cm.max_r == 10
        assert cm.stop_scaling == 8

    def test_mine_pair_derivation(self, config_dir):
        # patch use_mine on
        p = config_dir / "autoregressive_config.yaml"
        cfg = yaml.safe_load(p.read_text())
        cfg["use_mine"] = True
        cfg["system_type"] = "speaker_style_text"
        p.write_text(yaml.safe_dump(cfg))
        cm = ConfigManager(str(config_dir), "autoregressive")
        assert cm.config["mine_pair_types"] == ["style_text", "style_speaker",
                                                "text_speaker"]
        assert len(cm.mine_weights_dir) == 3
        # pretrained narrows pairs (config_manager.py:34-36)
        cfg["use_pretrained"] = True
        p.write_text(yaml.safe_dump(cfg))
        cm2 = ConfigManager(str(config_dir), "autoregressive")
        assert cm2.config["mine_pair_types"] == ["style_text", "style_speaker"]

    def test_schedule_values(self, config_dir):
        cm = ConfigManager(str(config_dir), "autoregressive")
        sv0 = cm.schedule_values(0)
        assert sv0["reduction_factor"] == 10
        assert sv0["decoder_prenet_dropout"] == 0.0
        sv_late = cm.schedule_values(100_000)
        assert sv_late["reduction_factor"] == 1
        assert sv_late["decoder_prenet_dropout"] == 0.5
        assert sv_late["drop_n_heads"] == 1

    @pytest.mark.parametrize("kind,cls_name", [
        ("autoregressive", "AutoregressiveTransformer"),
        ("forward", "ForwardTransformer"),
        ("wavernn", "WaveRNN"),
        ("tacotron", "Tacotron"),
    ])
    def test_model_factory_all_kinds(self, config_dir, kind, cls_name):
        cm = ConfigManager(str(config_dir), kind)
        model = cm.get_model(ignore_hash=True)
        assert type(model).__name__ == cls_name

    def test_dump_config_roundtrip(self, config_dir, tmp_path):
        cm = ConfigManager(str(config_dir), "forward", "dumptest")
        cm.create_remove_dirs(force=True)
        cm.dump_config()
        dumped = yaml.safe_load((cm.base_dir / "forward_config.yaml").read_text())
        assert dumped["session_name"] == cm.session_name

    def test_invalid_kind_raises(self, config_dir):
        with pytest.raises(TypeError):
            ConfigManager(str(config_dir), "nonexistent")


def test_precision_key_sets_model_dtype(tmp_path):
    """config `precision: bfloat16` -> bf16 compute dtype on the model
    (params stay fp32 master copies; see tests/test_overfit.py)."""
    import jax.numpy as jnp
    import shutil
    import yaml
    cfg = tmp_path / "cfg"
    shutil.copytree("configs/default", cfg)
    for name, extra in [("autoregressive_config.yaml", {}),
                        ("forward_config.yaml", {})]:
        f = cfg / name
        d = yaml.safe_load(f.read_text())
        d["precision"] = "bfloat16"
        f.write_text(yaml.safe_dump(d))
    dc = cfg / "data_config.yaml"
    d = yaml.safe_load(dc.read_text())
    d["data_directory"] = str(tmp_path)
    d["log_directory"] = str(tmp_path / "logs")
    d["train_data_directory"] = str(tmp_path)
    dc.write_text(yaml.safe_dump(d))
    from etts.utils.config import ConfigManager
    for kind in ("autoregressive", "forward"):
        cm = ConfigManager(str(cfg), kind)
        model = cm.get_model(ignore_hash=True)
        assert model.dtype == jnp.bfloat16, kind
