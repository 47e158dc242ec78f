"""Model registry: every model family is first-class (fixes the reference's
missing forward-model factory branch, SURVEY §1)."""
from .autoregressive import AutoregressiveTransformer, autoregressive_predict
from .forward import ForwardTransformer
from .tacotron import Tacotron, tacotron_loss, noam_learning_rate
from .wavernn import WaveRNN, generate as wavernn_generate
from .mine import MINE, CLUB, MIState

MODEL_REGISTRY = {
    "autoregressive": AutoregressiveTransformer,
    "forward": ForwardTransformer,
    "tacotron": Tacotron,
    "wavernn": WaveRNN,
}
