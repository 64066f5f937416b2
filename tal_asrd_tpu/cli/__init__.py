"""Command-line entry points (python -m tal_asrd_tpu.cli.<name>):

  train        — ASR training (wildspeech.asr.train parity)
  test         — aligned/unaligned evaluation (wildspeech.asr.test)
  transcribe   — windowed long-audio transcription (wildspeech.asr.transcribe)
  gen_embed    — speaker-embedding export (wildspeech.asr.gen_embed)
  train_embed  — contrastive metric head (wildspeech.asr.train_embed)
  train_lm     — shallow-fusion LM training
  wder         — WER/WDER scoring (wildspeech.wder)
  wder_search  — clustering grid search (wildspeech.wder_search[_emb])
  vad          — batch VAD + eval (wildspeech.vad.webrtcvad / eval)
  uisrnn       — UIS-RNN k-fold / streaming experiments
  tools        — tokenizer training, audio conversion/chunking, checkpoint
                 averaging, speaker expansion, output merging
"""
