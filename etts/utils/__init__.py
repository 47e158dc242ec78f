from .scheduling import piecewise_linear_schedule, reduction_schedule
from .losses import (new_scaled_crossentropy, masked_crossentropy,
                     masked_mean_squared_error, masked_mean_absolute_error,
                     l1_loss, l2_loss, weighted_sum_losses)
from .decorators import ignore_exception, time_it
from .display import ValueWindow, tight_grid, buffer_image
from .config import ConfigManager
from .checkpoints import CheckpointManager
