from tal_asrd_tpu.decode.beam import BeamSearchSpec, beam_search, make_generate_fn

__all__ = ["BeamSearchSpec", "beam_search", "make_generate_fn"]
