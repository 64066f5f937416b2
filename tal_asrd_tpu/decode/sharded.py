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
from tal_asrd_tpu.decode.unaligned import unaligned_decode_batched
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


def make_sharded_unaligned(model, spec, mesh):
    """Episode-parallel long-form decode: N full episodes sharded over the
    mesh's data axes, each shard running its lanes through the vmapped
    unaligned state machine (decode/unaligned.py unaligned_decode_batched).

    Combines the two long-form throughput levers: lane batching (lockstep
    vmap, wall = slowest lane) and episode parallelism across chips (params
    replicated, zero cross-chip traffic per token — the collectives are the
    initial broadcast and the global while-loop condition reduction). N must
    be divisible by the total data-parallel degree.

    The reference decodes episodes host-sequentially on one device
    (/root/reference/tal/asr/system.py:254-524); this is the pod-scale
    serving shape for the same computation."""

    def run(variables, audio, audio_lens):
        audio = jax.lax.with_sharding_constraint(audio, batch_sharding(mesh, 2))
        audio_lens = jax.lax.with_sharding_constraint(
            audio_lens, batch_sharding(mesh, 1))
        enc = model.apply(variables, audio, audio_lens, False,
                          method=ASRModel.encode)
        mask = enc.get("encoder_padding_mask")
        ns = (
            (~mask).sum(-1).astype(jnp.int32)
            if mask is not None
            else jnp.full((audio.shape[0],), enc["encoder_out"].shape[1],
                          jnp.int32)
        )
        return unaligned_decode_batched(model, variables, enc, ns, spec)

    return jax.jit(run)
