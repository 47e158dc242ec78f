from .state import TrainState, make_optimizer, interp_schedule
from .steps import (make_forward_train_step, make_forward_val_step,
                    make_autoregressive_train_step, make_autoregressive_val_step,
                    make_mine_update, make_mine_zoo_update,
                    make_wavernn_train_step,
                    make_tacotron_train_step)
