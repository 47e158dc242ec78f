"""etts — a TPU-native (JAX/XLA/Pallas/pjit) expressive speech synthesis framework.

A ground-up rebuild of the capabilities of
``sankar-mukherjee/Expressive-Speech-Synthesis-Research``: fused audio DSP,
text frontend, GST style modeling, autoregressive + duration-based forward
TransformerTTS, GST-Tacotron, MINE/CLUB mutual-information disentanglement,
attention-to-duration extraction, a batch-folded WaveRNN vocoder with a Pallas
sampling kernel, mesh-parallel training, and the objective evaluation suite.
"""

__version__ = "0.1.0"
