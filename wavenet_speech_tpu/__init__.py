"""wavenet_speech_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for
WaveNet-style nanopore basecalling / speech recognition.

Re-designed TPU-first implementation of the capabilities of the reference
repo paultsw/wavenet-speech (PyTorch/CUDA):

- dilated causal/non-causal conv stacks (WaveNet, WaveNetClassifier, RawCTCNet)
- on-device CTC loss (replaces warp-ctc) and CTC prefix beam search
  (replaces the native `ctcdecode` C++ dependency)
- synthetic nanopore data generators (pore model, Gaussian 5-mer, raw-signal)
- config-driven trainer with checkpointing, metrics and a device mesh
  (data / model / sequence axes) for multi-chip scaling.

Layout convention: all on-device sequence tensors are NLC
(batch, length, channels) so the channel dim maps onto TPU lanes; the
reference's NCL convention is converted at the API boundary.
"""

__version__ = "0.1.0"

from wavenet_speech_tpu import nn, ops, models, data, decoding, training, parallel, utils  # noqa: F401
