"""Window-parallel sharded inference.

The reference has no device-level sequence parallelism; long audio is handled
algorithmically (sliding windows, splicing — SURVEY §2.8). The TPU-idiomatic
way to scale that: batch the windows and shard the batch across the 'data'
mesh axis, replicating params — XLA splits the encoder and the KV-cached
decode across chips with zero cross-chip traffic per window (embarrassingly
parallel; the only collectives are the initial param broadcast).

`make_sharded_decode` returns a jitted function whose inputs ride
('data'|('dcn','data')) and whose outputs land sharded the same way, so a
following host gather only moves token ids, not activations.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from tal_asrd_tpu.decode.beam import BeamSearchSpec, beam_search
from tal_asrd_tpu.models.asr import ASRModel
from tal_asrd_tpu.parallel.mesh import batch_sharding, replicated_sharding


def make_sharded_decode(model: ASRModel, spec: BeamSearchSpec, mesh):
    """Jitted (variables, audio [B,T], audio_lens [B], prime [B,P]) ->
    beam_search outputs, with B sharded over the mesh's data axes. B must be
    divisible by the total data-parallel degree."""

    def run(variables, audio, audio_lens, prime):
        audio = jax.lax.with_sharding_constraint(audio, batch_sharding(mesh, 2))
        audio_lens = jax.lax.with_sharding_constraint(
            audio_lens, batch_sharding(mesh, 1))
        prime = jax.lax.with_sharding_constraint(prime, batch_sharding(mesh, 2))
        enc = model.apply(variables, audio, audio_lens, False,
                          method=ASRModel.encode)
        return beam_search(model, variables, enc, prime, spec)

    return jax.jit(run)
