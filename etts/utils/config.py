"""ConfigManager — YAML config system with session management.

Parity with `TransformerTTS/utils/config_manager.py`: merges
``data_config.yaml`` + ``{model_kind}_config.yaml``, derives MINE pair types
from ``system_type`` (:25-36), names sessions from the git hash, builds the
session dir tree including per-MINE-net weight dirs (:73-90), is the model
factory (:116-162), dumps configs next to weights, and re-applies schedules on
restore (:203-224). Extended to cover all four model kinds (the reference
could not build its own forward model — SURVEY §1).
"""
from __future__ import annotations

import shutil
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np
import yaml

from .scheduling import piecewise_linear_schedule, reduction_schedule

MODEL_KINDS = ("autoregressive", "forward", "wavernn", "tacotron")


class ConfigManager:
    def __init__(self, config_path: str, model_kind: str,
                 session_name: Optional[str] = None):
        if model_kind not in MODEL_KINDS:
            raise TypeError(f"model_kind must be in {list(MODEL_KINDS)}")
        self.config_path = Path(config_path)
        self.model_kind = model_kind
        self.config, self.data_config, self.model_config = self._load_config()
        self.git_hash = self._get_git_hash()

        if self.config.get("use_mine"):
            st = self.config.get("system_type")
            if st == "speaker_style_text":
                self.config["mine_pair_types"] = ["style_text", "style_speaker",
                                                  "text_speaker"]
            elif st == "style_text":
                self.config["mine_pair_types"] = ["style_text"]
            elif st == "speaker_text":
                self.config["mine_pair_types"] = ["speaker_text"]
            else:
                # text-only has no {style, speaker} embeddings to
                # disentangle; the reference leaves a stale yaml list and
                # crashes at the first step ('define system_type',
                # config_manager.py:33) — degrade to MI-less training instead
                print(f"use_mine with system_type={st!r}: no embedding "
                      f"pairs to disentangle, MINE disabled")
                self.config["mine_pair_types"] = []
            if self.config.get("use_pretrained") and st == "speaker_style_text":
                self.config["mine_pair_types"] = ["style_text", "style_speaker"]

        if session_name is None:
            session_name = self.config.get("session_name") or self.git_hash
        self.session_name = "_".join(
            filter(None, [self.config_path.name, session_name]))
        (self.base_dir, self.log_dir, self.train_datadir,
         self.weights_dir, self.mine_weights_dir) = self._make_folder_paths()
        # backwards-compatible alias (reference name)
        self.tts_weights_dir = self.weights_dir
        if "learning_rate_tts_schedule" in self.config:
            self.learning_rate = float(
                np.array(self.config["learning_rate_tts_schedule"])[0, 1])
        if model_kind == "autoregressive":
            self.max_r = int(
                np.array(self.config["reduction_factor_schedule"])[0, 1])
            self.stop_scaling = self.config.get("stop_loss_scaling", 1.0)

    # -- loading --------------------------------------------------------------

    def _load_config(self):
        with open(self.config_path / "data_config.yaml") as f:
            data_config = yaml.safe_load(f)
        with open(self.config_path / f"{self.model_kind}_config.yaml") as f:
            model_config = yaml.safe_load(f)
        all_config = {}
        all_config.update(model_config)
        all_config.update(data_config)
        return all_config, data_config, model_config

    @staticmethod
    def _get_git_hash():
        try:
            return subprocess.check_output(
                ["git", "describe", "--always"]).strip().decode()
        except Exception as e:  # noqa: BLE001
            print(f"WARNING: could not retrieve git hash. {e}")
            return None

    def _check_hash(self):
        try:
            git_hash = subprocess.check_output(
                ["git", "describe", "--always"]).strip().decode()
            if self.config.get("git_hash") and self.config["git_hash"] != git_hash:
                print(f"WARNING: git hash mismatch. Current: {git_hash}. "
                      f"Config hash: {self.config['git_hash']}")
        except Exception as e:  # noqa: BLE001
            print(f"WARNING: could not check git hash. {e}")

    def _make_folder_paths(self):
        base_dir = Path(self.config["log_directory"]) / self.session_name
        log_dir = base_dir / f"{self.model_kind}_logs"
        weights_dir = base_dir / f"{self.model_kind}_weights"
        train_datadir = Path(self.config.get("train_data_directory")
                             or self.config["data_directory"])
        mine_weights_dir = []
        if self.config.get("use_mine"):
            n = len(self.config["mine_pair_types"])
            if self.config.get("mine_type") == "MINE_CLUB":
                n *= 2
            mine_weights_dir = [base_dir / f"mine_weights_{i}"
                                for i in range(n)]
        return base_dir, log_dir, train_datadir, weights_dir, mine_weights_dir

    # -- introspection ----------------------------------------------------------

    def print_config(self):
        print("\nCONFIGURATION", self.session_name)
        for k, v in self.config.items():
            print("  -", k, ":", v)

    def update_config(self):
        for cfg in (self.config, self.model_config, self.data_config):
            cfg["git_hash"] = self.git_hash
            cfg["session_name"] = self.session_name

    # -- model factory ----------------------------------------------------------

    def get_text_pipeline(self, training: bool = False, backend=None):
        from ..text import Pipeline
        maker = (Pipeline.default_training_pipeline if training
                 else Pipeline.default_pipeline)
        # honor the backend the dataset was BUILT with (create_dataset
        # records it in data_config.yaml) so inference phonemization can
        # never silently mismatch the training vocabulary
        backend = backend or self.config.get("phonemizer_backend")
        return maker(self.config["phoneme_language"],
                     add_start_end=(self.model_kind == "autoregressive"),
                     with_stress=self.config.get("with_stress", False),
                     backend=backend)

    def get_model(self, ignore_hash: bool = False):
        if not ignore_hash:
            self._check_hash()
        c = self.config
        # mixed precision: bf16 compute, fp32 master params (config
        # ``precision: bfloat16``); checkpoints are dtype-identical to fp32
        import jax.numpy as jnp
        _dt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
               "bf16": jnp.bfloat16}[c.get("precision", "float32")]
        if self.model_kind == "autoregressive":
            from ..models.autoregressive import AutoregressiveTransformer
            vocab = self.get_text_pipeline().tokenizer.vocab_size
            return AutoregressiveTransformer(
                system_type=c["system_type"],
                dtype=_dt,
                mel_channels=c["mel_channels"],
                encoder_model_dimension=c["encoder_model_dimension"],
                decoder_model_dimension=c["decoder_model_dimension"],
                encoder_num_heads=tuple(c["encoder_num_heads"]),
                decoder_num_heads=tuple(c["decoder_num_heads"]),
                encoder_feed_forward_dimension=c["encoder_feed_forward_dimension"],
                decoder_feed_forward_dimension=c["decoder_feed_forward_dimension"],
                encoder_maximum_position_encoding=c["encoder_max_position_encoding"],
                decoder_maximum_position_encoding=c["decoder_max_position_encoding"],
                encoder_dense_blocks=c["encoder_dense_blocks"],
                decoder_dense_blocks=c["decoder_dense_blocks"],
                decoder_prenet_dimension=c["decoder_prenet_dimension"],
                encoder_prenet_dimension=c["encoder_prenet_dimension"],
                encoder_attention_conv_kernel=c["encoder_attention_conv_kernel"],
                decoder_attention_conv_kernel=c["decoder_attention_conv_kernel"],
                encoder_attention_conv_filters=c["encoder_attention_conv_filters"],
                decoder_attention_conv_filters=c["decoder_attention_conv_filters"],
                postnet_conv_filters=c["postnet_conv_filters"],
                postnet_conv_layers=c["postnet_conv_layers"],
                postnet_kernel_size=c["postnet_kernel_size"],
                dropout_rate=c["dropout_rate"],
                ref_encoder_filters=tuple(c["ref_encoder_filters"]),
                ref_encoder_kernel_size=c["ref_encoder_kernel_size"],
                ref_encoder_strides=c["ref_encoder_strides"],
                ref_encoder_gru_cell_units=c["ref_encoder_gru_cell_units"],
                gst_style_embed_dim=c["gst_style_embed_dim"],
                gst_multi_num_heads=c["gst_multi_num_heads"],
                gst_heads=c["gst_heads"],
                use_prosody_stats=c.get("use_prosody_stats", False),
                prosody_embed_dim=c.get("prosody_embed_dim", 32),
                max_r=self.max_r,
                mel_start_value=c["mel_start_value"],
                mel_end_value=c["mel_end_value"],
                vocab_size=vocab)
        if self.model_kind == "forward":
            from ..models.forward import ForwardTransformer
            vocab = self.get_text_pipeline().tokenizer.vocab_size
            return ForwardTransformer(
                dtype=_dt,
                mel_channels=c["mel_channels"],
                encoder_model_dimension=c["encoder_model_dimension"],
                decoder_model_dimension=c["decoder_model_dimension"],
                encoder_num_heads=tuple(c["encoder_num_heads"]),
                decoder_num_heads=tuple(c["decoder_num_heads"]),
                encoder_feed_forward_dimension=c["encoder_feed_forward_dimension"],
                decoder_feed_forward_dimension=c["decoder_feed_forward_dimension"],
                encoder_maximum_position_encoding=c["encoder_max_position_encoding"],
                decoder_maximum_position_encoding=c["decoder_max_position_encoding"],
                encoder_dense_blocks=c["encoder_dense_blocks"],
                decoder_dense_blocks=c["decoder_dense_blocks"],
                encoder_attention_conv_kernel=c["encoder_attention_conv_kernel"],
                decoder_attention_conv_kernel=c["decoder_attention_conv_kernel"],
                encoder_attention_conv_filters=c["encoder_attention_conv_filters"],
                decoder_attention_conv_filters=c["decoder_attention_conv_filters"],
                postnet_conv_filters=c["postnet_conv_filters"],
                postnet_conv_layers=c["postnet_conv_layers"],
                postnet_kernel_size=c["postnet_kernel_size"],
                dropout_rate=c["dropout_rate"],
                vocab_size=vocab)
        if self.model_kind == "wavernn":
            from ..models.wavernn import WaveRNN
            return WaveRNN(
                rnn_dims=c.get("voc_rnn_dims", 512),
                fc_dims=c.get("voc_fc_dims", 512),
                bits=c.get("bits", 9),
                pad=c.get("voc_pad", 2),
                upsample_factors=tuple(c.get("voc_upsample_factors", (5, 5, 8))),
                feat_dims=c["mel_channels"],
                compute_dims=c.get("voc_compute_dims", 128),
                res_out_dims=c.get("voc_res_out_dims", 128),
                res_blocks=c.get("voc_res_blocks", 10),
                hop_length=c["hop_length"],
                sample_rate=c["sampling_rate"],
                mode=c.get("voc_mode", "MOL"))
        # tacotron
        from ..models.tacotron import Tacotron
        from ..text import keithito_symbols
        return Tacotron(
            vocab_size=len(keithito_symbols),
            embed_depth=c.get("embed_depth", 256),
            encoder_depth=c.get("encoder_depth", 256),
            attention_depth=c.get("attention_depth", 256),
            rnn_depth=c.get("rnn_depth", 256),
            num_mels=c["mel_channels"],
            num_freq=c.get("num_freq", 1025),
            outputs_per_step=c.get("outputs_per_step", 2),
            prenet_depths=tuple(c.get("prenet_depths", (256, 128))),
            use_gst=c.get("use_gst", True),
            num_gst=c.get("num_gst", 10),
            num_heads=c.get("num_heads", 4),
            style_embed_depth=c.get("style_embed_depth", 256),
            style_att_dim=c.get("style_att_dim", 128),
            style_att_type=c.get("style_att_type", "mlp_attention"),
            reference_filters=tuple(c.get("reference_filters",
                                          (32, 32, 64, 64, 128, 128))),
            reference_depth=c.get("reference_depth", 128),
            cbhg_width=c.get("cbhg_width", 128),
            max_iters=c.get("max_iters", 1000))

    # -- session dirs / dumping ---------------------------------------------------

    def dump_config(self):
        self.update_config()
        with open(self.base_dir / f"{self.model_kind}_config.yaml", "w") as f:
            yaml.safe_dump(self.model_config, f)
        with open(self.base_dir / "data_config.yaml", "w") as f:
            yaml.safe_dump(self.data_config, f)

    def create_remove_dirs(self, clear_dir=False, clear_logs=False,
                           clear_weights=False, force=False):
        self.base_dir.mkdir(parents=True, exist_ok=True)

        def _confirm(what):
            if force:
                return True
            return input(f"Delete {what}? (y/[n])") == "y"

        if clear_dir and _confirm(f"{self.log_dir} AND {self.weights_dir}"):
            shutil.rmtree(self.log_dir, ignore_errors=True)
            shutil.rmtree(self.weights_dir, ignore_errors=True)
        if clear_logs and _confirm(self.log_dir):
            shutil.rmtree(self.log_dir, ignore_errors=True)
        if clear_weights and _confirm(self.weights_dir):
            shutil.rmtree(self.weights_dir, ignore_errors=True)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.weights_dir.mkdir(parents=True, exist_ok=True)

    # -- restore -------------------------------------------------------------------

    def schedule_values(self, step: int):
        """Schedule-derived runtime constants at a step (load_model :219-223)."""
        out = {"decoder_prenet_dropout": piecewise_linear_schedule(
            step, self.config["decoder_prenet_dropout_schedule"])
            if "decoder_prenet_dropout_schedule" in self.config else 0.0}
        if self.model_kind == "autoregressive":
            out["reduction_factor"] = reduction_schedule(
                step, self.config["reduction_factor_schedule"])
        if "head_drop_schedule" in self.config:
            out["drop_n_heads"] = reduction_schedule(
                step, self.config["head_drop_schedule"])
        if "learning_rate_tts_schedule" in self.config:
            out["learning_rate"] = piecewise_linear_schedule(
                step, self.config["learning_rate_tts_schedule"])
        return out

    def load_model(self, checkpoint_path=None, verbose=True):
        """Build model + restore latest (or given) checkpoint. Returns
        (model, variables, step, schedule_values)."""
        import jax
        import numpy as np
        from .checkpoints import CheckpointManager as CkptMngr
        model = self.get_model()
        variables = _init_variables(model, self.config, self.model_kind)
        # partial restore: params/batch_stats/step without the opt pytree
        tree = {"params": variables["params"],
                "batch_stats": variables.get("batch_stats", {}),
                "step": np.int32(0)}
        if checkpoint_path is not None:
            restored, step = CkptMngr(Path(checkpoint_path).parent).restore(
                tree, int(Path(checkpoint_path).name), partial=True)
        else:
            restored, step = CkptMngr(self.weights_dir).restore(tree,
                                                                partial=True)
        if step is None:
            if verbose:
                print(f"WARNING: could not find weights file in "
                      f"{self.weights_dir}. Using fresh init.")
            step = 0
        else:
            variables = {"params": restored["params"]}
            if restored.get("batch_stats"):
                variables["batch_stats"] = restored["batch_stats"]
            step = int(restored["step"])
            if verbose:
                print(f"restored weights from {self.weights_dir} at step {step}")
        if "batch_stats" not in variables:
            variables["batch_stats"] = {}
        return model, variables, step, self.schedule_values(step)


def _init_variables(model, config, model_kind):
    """Shape-driven init for checkpoint structure."""
    import jax
    import jax.numpy as jnp
    k = jax.random.PRNGKey(0)
    rngs = {"params": k, "dropout": k, "prenet": k, "zoneout": k, "style": k}
    mel_c = config["mel_channels"]
    if model_kind == "autoregressive":
        spk = (jnp.zeros((1, 1, 256))
               if "speaker" in config.get("system_type", "") else None)
        return model.init(rngs, jnp.ones((1, 8), jnp.int32),
                          jnp.zeros((1, 6, mel_c)), spk, r=1)
    if model_kind == "forward":
        return model.init(rngs, jnp.ones((1, 8), jnp.int32),
                          jnp.full((1, 8, 1), 2.0), max_frames=24)
    if model_kind == "wavernn":
        pad = config.get("voc_pad", 2)
        hop = config["hop_length"]
        t_mel = 2 * pad + 4
        return model.init(k, jnp.zeros((1, 4 * hop)),
                          jnp.zeros((1, t_mel, mel_c)), False)
    # tacotron
    return model.init(rngs, jnp.ones((1, 8), jnp.int32), jnp.array([8]),
                      jnp.zeros((1, 2 * model.outputs_per_step, mel_c)))
