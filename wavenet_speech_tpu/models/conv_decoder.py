"""Attentional fully-convolutional decoder (FAIRSeq-style), functional
parity with reference modules/conv_decoder.py:66-489 — the reference's
exploratory seq2seq decoder (not wired into any driver there, ported for
capability completeness).

Structure per layer (conv_decoder.py:192-202):
  [optional LayerNorm] -> causal GLU conv block (two causal convs, k, d=1;
  GLU(a, b) = a * sigmoid(b), conv_decoder.py:485-486; + Linear residual of
  the block input) -> + Linear residual of the *embedded targets* ->
  + dot-product attention over the encoding.

Attention (conv_decoder.py:433-474) uses the reference's *sum-normalized*
dot products (raw / sum(raw)), NOT softmax — reproduced verbatim.

Layout: NLC (the reference uses (S, B, C); math is identical).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from wavenet_speech_tpu.nn.core import Module, Params, rngs
from wavenet_speech_tpu.nn import initializers as init
from wavenet_speech_tpu.ops.conv import causal_conv1d
from wavenet_speech_tpu.ops.norm import LayerNorm
from wavenet_speech_tpu.models.rnn_decoder import xavier_normal


def glu(x, y):
    """x * sigmoid(y) (reference GLU, conv_decoder.py:485-486)."""
    return x * jax.nn.sigmoid(y)


@dataclasses.dataclass(frozen=True)
class AttnConvolutionalDecoder(Module):
    """layers: [(kwidth, in_channels, out_channels)]; embed_dim must equal
    layers[0][1] (reference sanity check, conv_decoder.py:105)."""

    num_labels: int
    embed_dim: int
    layers: Tuple[Tuple[int, int, int], ...]
    encoding_dim: int
    max_time: int
    norm: bool = False

    def __post_init__(self):
        object.__setattr__(self, "layers", tuple(tuple(l) for l in self.layers))
        assert self.embed_dim == self.layers[0][1]

    def init(self, key) -> Params:
        E = self.embed_dim
        ks = rngs(key, 4 + 2 * len(self.layers))
        params = {
            "label_embed": xavier_normal(ks[0], (self.num_labels, E)),
            "time_embed": xavier_normal(ks[1], (self.max_time, E)),
            "output_residual": {"w": xavier_normal(ks[2], (self.num_labels, E)),
                                "b": jnp.zeros((self.num_labels,))},
            "output_proj": {"w": xavier_normal(ks[3], (self.num_labels,
                                                       self.layers[-1][2])),
                            "b": jnp.zeros((self.num_labels,))},
        }
        for i, (kw, cin, cout) in enumerate(self.layers):
            k = rngs(ks[4 + i], 8)
            layer = {
                "input_residual": {"w": xavier_normal(k[0], (cout, E)),
                                   "b": jnp.zeros((cout,))},
                "conv_glu": {"w": xavier_normal(k[1], (kw, cin, cout))
                             .astype(jnp.float32),
                             "b": jnp.zeros((cout,))},
                "conv_id": {"w": xavier_normal(k[2], (kw, cin, cout)),
                            "b": jnp.zeros((cout,))},
                "block_residual": {"w": xavier_normal(k[3], (cout, cin)),
                                   "b": jnp.zeros((cout,))},
                "attn": {
                    "in2enc": {"w": xavier_normal(k[4], (self.encoding_dim, cout)),
                               "b": jnp.zeros((self.encoding_dim,))},
                    "lab2enc": {"w": xavier_normal(k[5], (self.encoding_dim, E)),
                                "b": jnp.zeros((self.encoding_dim,))},
                    "enc2in": {"w": xavier_normal(k[6], (cout, self.encoding_dim)),
                               "b": jnp.zeros((cout,))},
                },
            }
            if self.norm:
                layer["norm"] = LayerNorm(cin).init(k[7])
            params[f"layer{i}"] = layer
        return params

    def _attention(self, p, in_seq, enc_seq, embedded_targets):
        """Sum-normalized dot-product attention (conv_decoder.py:433-474).
        in_seq (B, T, C), enc_seq (B, Le, Enc)."""
        d = (in_seq @ p["in2enc"]["w"].T + p["in2enc"]["b"]
             + embedded_targets @ p["lab2enc"]["w"].T + p["lab2enc"]["b"])
        raw = jnp.einsum("bte,ble->btl", d, enc_seq)       # (B, T, Le)
        attns = raw / jnp.sum(raw, axis=2, keepdims=True)  # sum-normalized!
        ctx = jnp.einsum("btl,ble->bte", attns, enc_seq)
        return ctx @ p["enc2in"]["w"].T + p["enc2in"]["b"]

    def apply(self, params: Params, encoding, targets):
        """Teacher-forced parallel forward (conv_decoder.py:165-208).
        encoding: (B, Le, encoding_dim); targets: (B, max_time) int.
        Returns (B, max_time, num_labels) unnormalized logits."""
        B, T = targets.shape
        assert T == self.max_time
        emb = params["label_embed"][targets]
        emb = emb + params["time_embed"][jnp.arange(T)][None]
        conv_seq = emb
        for i, (kw, cin, cout) in enumerate(self.layers):
            p = params[f"layer{i}"]
            if self.norm:
                conv_seq = LayerNorm(cin).apply(p["norm"], conv_seq)
            a = causal_conv1d(conv_seq, p["conv_glu"]["w"], p["conv_glu"]["b"])
            b = causal_conv1d(conv_seq, p["conv_id"]["w"], p["conv_id"]["b"])
            block = glu(a, b) + (conv_seq @ p["block_residual"]["w"].T
                                 + p["block_residual"]["b"])
            conv_seq = block + (emb @ p["input_residual"]["w"].T
                                + p["input_residual"]["b"])
            conv_seq = conv_seq + self._attention(p["attn"], conv_seq,
                                                  encoding, emb)
        out = conv_seq @ params["output_proj"]["w"].T + params["output_proj"]["b"]
        return out + (emb @ params["output_residual"]["w"].T
                      + params["output_residual"]["b"])
