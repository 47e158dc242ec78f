"""Copy-resume mechanics for fine-tune sessions (scripts/setup_finetune.py).

The round-4 exposure-bias experiment seeds a new session with one copied
orbax step dir; the training driver must then restore it as the latest step
and continue under the new config's schedules.
"""
import sys
from pathlib import Path

import jax.numpy as jnp

from etts.train import TrainState, make_optimizer
from etts.utils.checkpoints import CheckpointManager

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


def test_seed_session_copy_resume(tmp_path):
    from setup_finetune import seed_session
    src, dst = tmp_path / "A", tmp_path / "B"
    tx = make_optimizer([[0, 1e-3]])
    state = TrainState.create({"params": {"w": jnp.arange(4.0)}}, tx)
    m = CheckpointManager(src)
    m.save_state(6, state.replace(step=6))
    m.save_state(14, state.replace(step=14))

    seed_session(src, 14, dst)

    m2 = CheckpointManager(dst)
    assert m2.latest_step() == 14
    fresh = TrainState.create({"params": {"w": jnp.zeros(4)}}, tx)
    restored, step = m2.restore_state(fresh)
    assert step == 14 and int(restored.step) == 14
    assert (restored.params["w"] == jnp.arange(4.0)).all()
    # only the seeded step came across, not the source's other steps
    assert not (dst / "6").exists()
