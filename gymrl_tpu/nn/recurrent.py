"""Recurrent cells: MLPRNN and URNN as explicit-state scan cells.

Reference parity:
  * ``MLPRNN`` — utils/model.py:290-302 / ppo_rnn_lunarlander.py:123-139:
    hybrid layer where 3/4 of the output comes from a Linear on the input
    and 1/4 from a GRU (hidden = output_dim // 4), concatenated. The
    Linear has NO trailing activation (MLP([in, out]) with last_act=False).
  * ``URNN`` — ppo_lstm_lunarlander.py:449-491: GRU/LSTM-agnostic cell
    whose hidden state is packed into ONE flat vector (`chunk_size`
    blocks), so trainers store/restore hiddens uniformly regardless of
    cell type (LSTM packs (h, c), GRU packs h).

TPU shape: cells are `(carry, x) -> (carry, y)` pure functions; trainers
unroll them with `lax.scan` over time inside each device's shard — the
reference's stateful ``self.rnn_h`` (BaseRNNModel, utils/model.py:307-324)
becomes explicit carry plumbing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from gymrl_tpu.nn.layers import MLP


class MLPRNNCell(nn.Module):
    """One step of the hybrid MLP+GRU layer. Carry: h[B, output_dim//4]."""

    output_dim: int

    @property
    def rnn_size(self) -> int:
        assert self.output_dim % 4 == 0
        return self.output_dim // 4

    @nn.compact
    def __call__(self, h, x):
        linear_out = MLP([3 * self.rnn_size], name="rnn_linear")(x)
        h, rnn_out = nn.GRUCell(self.rnn_size, name="gru")(h, x)
        return h, jnp.concatenate([linear_out, rnn_out], axis=-1)

    def initial_state(self, batch: int):
        return jnp.zeros((batch, self.rnn_size), jnp.float32)


class URNNCell(nn.Module):
    """Unified RNN cell with flat packed hidden (ppo_lstm_lunarlander.py:449-491).

    ``cell_type``: 'gru' (packed [h]) or 'lstm' (packed [h | c]); the packed
    width is ``hidden_size * chunks`` where chunks = 1 (gru) or 2 (lstm).
    """

    hidden_size: int
    cell_type: str = "gru"

    @property
    def chunks(self) -> int:
        return 2 if self.cell_type == "lstm" else 1

    @property
    def packed_size(self) -> int:
        return self.hidden_size * self.chunks

    @nn.compact
    def __call__(self, packed, x):
        if self.cell_type == "lstm":
            h, c = jnp.split(packed, 2, axis=-1)
            (c, h), out = nn.OptimizedLSTMCell(self.hidden_size, name="lstm")((c, h), x)
            return jnp.concatenate([h, c], axis=-1), out
        h = packed
        h, out = nn.GRUCell(self.hidden_size, name="gru")(h, x)
        return h, out

    def initial_state(self, batch: int):
        return jnp.zeros((batch, self.packed_size), jnp.float32)
