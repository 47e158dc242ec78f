"""Multi-host data-parallel worker (run as ``python -m etts.parallel._multihost_worker``).

Simulates one host of a DCN-style multi-process job on CPU devices: joins the
cluster via ``init_multihost`` (jax.distributed), builds the global mesh, feeds
this host its ``local_shard`` of a deterministic global batch, and runs ONE
jitted data-parallel train step of a tiny ForwardTransformer. Prints
``MULTIHOST_LOSS <value>`` — every process must print the same number, and it
must match a single-process run of the same global batch (asserted by
``tests/test_multihost.py`` and ``__graft_entry__.dryrun_multichip``).

The reference has no multi-device code at all (SURVEY §2.5); this is the
TPU-native multi-host story exercised end to end.
"""
import argparse
import os
import sys

# must precede any jax import/device use
os.environ["JAX_PLATFORMS"] = "cpu"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, required=True)
    parser.add_argument("--process_id", type=int, required=True)
    parser.add_argument("--num_processes", type=int, default=2)
    parser.add_argument("--ckpt_dir", type=str, default=None,
                        help="exercise checkpoint save + restore and TB "
                             "logging discipline across the process group")
    args = parser.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    try:  # persistent compile cache: reruns of this worker skip XLA compile.
        # CPU entries live in their own dir (.jax_cache_cpu): XLA:CPU AOT
        # results embed host machine features, and entries written on a
        # different host make every lookup load-and-reject (slow enough to
        # blow the 30 s gloo context-init deadline) or risk SIGILL.
        repo = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.join(repo, ".jax_cache_cpu"))
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp

    from etts.parallel import (init_multihost, make_mesh, shard_batch,
                               replicate, local_shard)
    from etts.train import TrainState, make_optimizer, make_forward_train_step
    from etts.models.forward import ForwardTransformer

    if args.num_processes > 1:
        active = init_multihost(f"127.0.0.1:{args.port}",
                                args.num_processes, args.process_id)
        assert active and jax.process_count() == args.num_processes

    model = ForwardTransformer(
        encoder_model_dimension=32, decoder_model_dimension=32,
        encoder_num_heads=(2, 2), decoder_num_heads=(2, 2),
        encoder_dense_blocks=2, decoder_dense_blocks=2,
        encoder_feed_forward_dimension=64, decoder_feed_forward_dimension=64,
        encoder_attention_conv_filters=32, decoder_attention_conv_filters=32,
        postnet_conv_filters=32, postnet_conv_layers=2, postnet_kernel_size=3,
        mel_channels=12, vocab_size=40,
        encoder_maximum_position_encoding=100,
        decoder_maximum_position_encoding=300)
    key = jax.random.PRNGKey(0)
    # identical global batch on every host (same seed)
    mel = jax.random.normal(key, (8, 20, 12))
    phon = jax.random.randint(key, (8, 10), 1, 40)
    durs = jnp.full((8, 10), 2.0)
    variables = model.init({"params": key, "dropout": key, "prenet": key},
                           phon, durs[..., None], max_frames=20)
    tx = make_optimizer([[0, 1e-3]])
    step = make_forward_train_step(model, tx, max_frames=20)

    mesh = make_mesh(("data",))
    if args.num_processes > 1:
        # establish the cross-process gloo communicator with a trivial psum
        # BEFORE the train-step compile: context init has a 30 s key-exchange
        # deadline, and a process still compiling while its peer executes
        # would blow it (the communicator is cached per process group)
        from jax.sharding import PartitionSpec as P
        from jax import shard_map
        warm = jax.jit(shard_map(lambda x: jax.lax.psum(x, "data"),
                                 mesh=mesh, in_specs=P("data"),
                                 out_specs=P()))
        vec = shard_batch(local_shard(
            jnp.ones((jax.device_count(),), jnp.float32)), mesh)
        jax.block_until_ready(warm(vec))
    state = replicate(TrainState.create(variables, tx), mesh)
    batch = shard_batch(local_shard((mel, phon, durs)), mesh)
    state, metrics = step(state, batch, key)
    loss = float(metrics["loss"])
    print(f"MULTIHOST_LOSS {loss:.8f}", flush=True)
    assert jnp.isfinite(loss)

    if args.ckpt_dir:
        # checkpoint + logging discipline across the process group:
        # EVERY process calls save_state (orbax coordinates; with DP all
        # saved arrays are host-replicated), only the primary writes TB
        from etts.utils.checkpoints import CheckpointManager
        from etts.utils.logging import SummaryManager

        summary = SummaryManager(model, os.path.join(args.ckpt_dir, "logs"),
                                 {})
        summary.add_scalar("train/loss", loss, step=1)
        ckpt = CheckpointManager(args.ckpt_dir, max_to_keep=2)
        ckpt.save_state(1, state)
        assert ckpt.latest_step() == 1, ckpt.latest_step()
        # mid-"run" resume: a FRESH state restored from disk must continue
        # identically on every process
        fresh = replicate(TrainState.create(
            model.init({"params": jax.random.PRNGKey(9), "dropout": key,
                        "prenet": key}, phon, durs[..., None],
                       max_frames=20), tx), mesh)
        restored, rstep = ckpt.restore_state(fresh)
        assert rstep == 1, rstep
        import numpy as np
        for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                        jax.tree_util.tree_leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        restored = replicate(restored, mesh)
        state2, metrics2 = step(restored, batch, jax.random.fold_in(key, 1))
        print(f"MULTIHOST_RESUME_LOSS {float(metrics2['loss']):.8f}",
              flush=True)
        ckpt.close()


if __name__ == "__main__":
    sys.exit(main())
