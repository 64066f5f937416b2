"""Corpus / checkpoint tooling CLI.

Covers the reference's data_scratch + utils scripts as subcommands:
  * train-tokenizer  — BPE training (tal-cased.py / SentencePieceTrainer)
  * convert-audio    — any container -> mono 16 kHz wav (convert_wav.py,
                       utils/audio.py)
  * chunk-audio      — split wavs into fixed chunks (chunk_audio.py)
  * average-ckpt     — last-k checkpoint averaging (utils/average_weights.py)
  * expand-speakers  — embedding-row expansion (utils/expand_speakers.py)
  * merge-outputs    — jsonl shards -> pickle (utils/merge_outputs.py)
  * force-align      — attention forced aligner (alignment/aeneas.py)
"""
from __future__ import annotations

import argparse
import os
from glob import glob


def main(argv=None):
    p = argparse.ArgumentParser("tal_asrd_tpu tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train-tokenizer")
    t.add_argument("--input", required=True, help="text corpus file")
    t.add_argument("--model-prefix", required=True)
    t.add_argument("--vocab-size", type=int, default=10000)
    t.add_argument("--character-coverage", type=float, default=1.0)

    c = sub.add_parser("convert-audio")
    c.add_argument("--src", required=True)
    c.add_argument("--out-dir", required=True)
    c.add_argument("--sr", type=int, default=16000)

    ch = sub.add_parser("chunk-audio")
    ch.add_argument("--src", required=True)
    ch.add_argument("--out-dir", required=True)
    ch.add_argument("--chunk-secs", type=float, default=30.0)

    a = sub.add_parser("average-ckpt")
    a.add_argument("--ckpt-dir", required=True)
    a.add_argument("--last-k", type=int, default=5)
    a.add_argument("--out", required=True)

    e = sub.add_parser("expand-speakers")
    e.add_argument("--ckpt", required=True)
    e.add_argument("--num-tokens", type=int, required=True)
    e.add_argument("--out", required=True)

    m = sub.add_parser("merge-outputs")
    m.add_argument("--inputs", nargs="+", required=True)
    m.add_argument("--out", required=True)

    ls = sub.add_parser("librispeech-format",
                        help="LibriSpeech layout -> transcript.pkl corpus")
    ls.add_argument("--src", required=True,
                    help="LibriSpeech split dir (speaker/chapter/*.flac|wav + .trans.txt)")
    ls.add_argument("--out-dir", required=True)

    wf = sub.add_parser("wder-format",
                        help="test_result.pkl -> wder_ready.pkl "
                             "(aligned_to_wder_format.py:245-434 equivalent)")
    wf.add_argument("--test-result", required=True)
    wf.add_argument("--out", required=True)
    wf.add_argument("--role-map", default=None,
                    help="optional speaker->role json")
    wf.add_argument("--sd-features", default=None,
                    help="optional .npy of separate-SD frame features for "
                         "attention-weighted speaker embeddings")
    wf.add_argument("--chunk", type=int, default=357)

    df = sub.add_parser("diar-features",
                        help="per-utterance diarization features over a "
                             "TAL-format corpus -> per-episode (sequences, "
                             "cluster_ids) pickles for the UIS-RNN runners "
                             "(extract_features_tal.py:28-249 equivalent)")
    df.add_argument("--data", required=True, help="corpus dir (transcript.pkl)")
    df.add_argument("--out-dir", required=True)
    df.add_argument("--features", choices=["logmel", "wav2vec"],
                    default="logmel",
                    help="logmel: mean+std pooled log-mel (160-d); wav2vec: "
                         "mean-pooled aggregator features (requires weights "
                         "or uses random-init as a fixed feature hash)")
    df.add_argument("--wav2vec-ckpt", default=None,
                    help="optional converted fairseq wav2vec weights")

    sy = sub.add_parser("synth-corpus",
                        help="synthetic-speech TAL-format corpus (audio encodes "
                             "the text; for the self-contained accuracy loop)")
    sy.add_argument("--out-dir", required=True)
    sy.add_argument("--episodes", type=int, default=8)
    sy.add_argument("--episode-seconds", type=float, default=120.0)
    sy.add_argument("--speakers", type=int, default=4)
    sy.add_argument("--seed", type=int, default=0)

    ss = sub.add_parser("synth-sad-stress",
                        help="SAD stress corpus: noise floor, SNR sweep, "
                             "crossfaded bounds, hum/burst distractors "
                             "(de-saturates the SAD eval, VERDICT r3 #8)")
    ss.add_argument("--out-dir", required=True)
    ss.add_argument("--episodes", type=int, default=6)
    ss.add_argument("--episode-seconds", type=float, default=90.0)
    ss.add_argument("--speakers", type=int, default=8)
    ss.add_argument("--seed", type=int, default=0)
    ss.add_argument("--snr-low", type=float, default=0.0)
    ss.add_argument("--snr-high", type=float, default=20.0)
    ss.add_argument("--noise-rms", type=float, default=0.02)

    args = p.parse_args(argv)

    if args.cmd == "train-tokenizer":
        from tal_asrd_tpu.text import BpeTrainer

        model = BpeTrainer(args.vocab_size, args.character_coverage).train_file(
            args.input, args.model_prefix + ".model"
        )
        print(f"trained {len(model)}-piece model -> {args.model_prefix}.model")

    elif args.cmd == "convert-audio":
        from tal_asrd_tpu.data.audio_io import convert_audio

        files = glob(args.src) if any(ch in args.src for ch in "*?") else [args.src]
        os.makedirs(args.out_dir, exist_ok=True)
        for f in files:
            stub = os.path.splitext(os.path.basename(f))[0]
            convert_audio(f, os.path.join(args.out_dir, stub + ".wav"), args.sr)
        print(f"converted {len(files)} files")

    elif args.cmd == "chunk-audio":
        from tal_asrd_tpu.data.audio_io import get_duration, load_audio_segment, write_wav

        files = glob(args.src) if any(ch in args.src for ch in "*?") else [args.src]
        os.makedirs(args.out_dir, exist_ok=True)
        for f in files:
            stub = os.path.splitext(os.path.basename(f))[0]
            dur = get_duration(f)
            i = 0
            t = 0.0
            while t < dur:
                seg = load_audio_segment(f, t, min(t + args.chunk_secs, dur))
                write_wav(os.path.join(args.out_dir, f"{stub}_{i:04d}.wav"), seg)
                t += args.chunk_secs
                i += 1
        print("done")

    elif args.cmd == "average-ckpt":
        from tal_asrd_tpu.core.checkpoint import CheckpointManager, save_pytree

        mgr = CheckpointManager(args.ckpt_dir)
        avg = mgr.average_last(args.last_k)
        save_pytree(args.out, avg)
        print(f"averaged last {args.last_k} of {len(mgr.steps())} -> {args.out}")

    elif args.cmd == "expand-speakers":
        import numpy as np

        from tal_asrd_tpu.core.checkpoint import (
            expand_speaker_embeddings,
            load_pytree,
            save_pytree,
        )

        params = load_pytree(args.ckpt)
        emb = np.asarray(params["embedding"]["embedding"])
        params["embedding"]["embedding"] = expand_speaker_embeddings(
            emb, args.num_tokens
        )
        save_pytree(args.out, params)
        print(f"expanded embedding {emb.shape[0]} -> {args.num_tokens} rows")

    elif args.cmd == "merge-outputs":
        from tal_asrd_tpu.eval.tools import merge_outputs

        rows = merge_outputs(args.inputs, args.out)
        print(f"merged {len(rows)} rows -> {args.out}")

    elif args.cmd == "librispeech-format":
        # LibriSpeech reformatting (data_scratch/librispeech_*.py capability):
        # one "episode" per chapter; each utterance file becomes an utterance
        # dict spanning its position in the concatenated chapter audio.
        import pickle

        import numpy as np

        from tal_asrd_tpu.data.audio_io import (
            DEFAULT_SR,
            convert_audio,
            get_duration,
            load_audio_segment,
            write_wav,
        )

        os.makedirs(args.out_dir, exist_ok=True)
        transcripts = {}
        speakers = {}
        for spk_dir in sorted(os.listdir(args.src)):
            spk_path = os.path.join(args.src, spk_dir)
            if not os.path.isdir(spk_path):
                continue
            for chap_dir in sorted(os.listdir(spk_path)):
                chap_path = os.path.join(spk_path, chap_dir)
                trans = glob(os.path.join(chap_path, "*.trans.txt"))
                if not trans:
                    continue
                lines = {}
                with open(trans[0]) as f:
                    for line in f:
                        utt_id, _, text = line.strip().partition(" ")
                        lines[utt_id] = text
                stub = f"{spk_dir}-{chap_dir}"
                chunks, utts, t = [], [], 0.0
                for utt_id in sorted(lines):
                    for ext in (".wav", ".flac"):
                        ap = os.path.join(chap_path, utt_id + ext)
                        if os.path.exists(ap):
                            break
                    else:
                        continue
                    if ap.endswith(".flac"):
                        tmp = os.path.join(args.out_dir, utt_id + ".tmp.wav")
                        convert_audio(ap, tmp)
                        ap = tmp
                    x = load_audio_segment(ap, 0.0, None)
                    dur = len(x) / DEFAULT_SR
                    utts.append({
                        "utterance": lines[utt_id].lower(),
                        "speaker": spk_dir,
                        "utterance_start": t,
                        "utterance_end": t + dur,
                        "role": "subject",
                    })
                    chunks.append(x)
                    t += dur
                    if ap.endswith(".tmp.wav"):
                        os.remove(ap)
                if not chunks:
                    continue
                write_wav(os.path.join(args.out_dir, stub + ".wav"),
                          np.concatenate(chunks))
                transcripts[stub] = utts
                speakers.setdefault(spk_dir.lower(), len(speakers))
        with open(os.path.join(args.out_dir, "transcript.pkl"), "wb") as f:
            pickle.dump(transcripts, f)
        import json

        with open(os.path.join(args.out_dir, "speaker_map.json"), "w") as f:
            json.dump(speakers, f)
        print(f"wrote {len(transcripts)} episodes to {args.out_dir}")

    elif args.cmd == "wder-format":
        import json as _json
        import pickle as _pickle

        from tal_asrd_tpu.eval.convert import convert_results

        with open(args.test_result, "rb") as f:
            results = _pickle.load(f)
        role_map = None
        if args.role_map:
            with open(args.role_map) as f:
                role_map = _json.load(f)
        if args.sd_features:
            import numpy as np
            sd = np.load(args.sd_features)
        else:
            sd = None
        out = convert_results(results, role_map=role_map, sd_features=sd,
                              chunk=args.chunk)
        with open(args.out, "wb") as f:
            _pickle.dump(out, f)
        print(f"wrote {len(out)} wder-ready pairs to {args.out}")

    elif args.cmd == "diar-features":
        import pickle

        import numpy as np

        from tal_asrd_tpu.data.audio_io import load_audio_segment
        from tal_asrd_tpu.ops.logmel import (
            FrontendConfig,
            _hann_periodic,
            mel_filterbank,
        )

        def _numpy_logmel(audio, cfg, fb):
            n, hop, win = cfg.n_fft, cfg.hop_length, cfg.win_length
            pad = n // 2
            x = np.pad(audio, (pad, pad), mode="reflect")
            n_fr = 1 + (len(x) - n) // hop
            idx = np.arange(n)[None, :] + hop * np.arange(n_fr)[:, None]
            frames = x[idx] * _hann_periodic(win)
            spec = np.abs(np.fft.rfft(frames, n=n, axis=-1)) ** 2
            return np.log(spec @ fb + cfg.log_eps)

        with open(os.path.join(args.data, "transcript.pkl"), "rb") as f:
            transcripts = pickle.load(f)
        os.makedirs(args.out_dir, exist_ok=True)

        if args.features == "wav2vec":
            from tal_asrd_tpu.core.checkpoint import load_pytree
            from tal_asrd_tpu.diarization.wav2vec import (
                extract_utterance_features,
                init_wav2vec,
            )

            w2v_model, w2v_vars = init_wav2vec()
            if args.wav2vec_ckpt:
                w2v_vars = {"params": load_pytree(args.wav2vec_ckpt)}

        fe_cfg = FrontendConfig(mean_subtract=False)
        fb = mel_filterbank(
            fe_cfg.n_fft // 2 + 1, fe_cfg.f_min, fe_cfg.effective_f_max,
            fe_cfg.n_mels, fe_cfg.sample_rate,
        )
        for stub, utts in transcripts.items():
            wav = os.path.join(args.data, stub + ".wav")
            feats, ids = [], []
            for u in utts:
                audio = load_audio_segment(
                    wav, u["utterance_start"], u["utterance_end"]
                )
                if len(audio) < 400:
                    continue
                if args.features == "logmel":
                    # Mean+std pooled log-mel: an 80+80-d utterance signature
                    # (the hum/formant speaker cues live in the spectral
                    # envelope; stats pooling is the classic x-vector front).
                    # Pure numpy (same window/filterbank as ops/logmel): this
                    # is a host-side tool over variable-length utterances —
                    # jit would compile one graph per length.
                    mel = _numpy_logmel(audio, fe_cfg, fb)
                    v = np.concatenate([mel.mean(0), mel.std(0)])
                else:
                    v = extract_utterance_features(
                        w2v_model, w2v_vars, audio, window_s=None
                    ).mean(axis=0)
                feats.append(v.astype(np.float32))
                ids.append(u["speaker"])
            if not feats:
                continue
            with open(os.path.join(args.out_dir, stub + ".pkl"), "wb") as f:
                pickle.dump((np.stack(feats), ids), f)
            print(f"{stub}: {len(feats)} utterances x {feats[0].shape[0]}-d")
        print(f"wrote {len(transcripts)} episode feature files to {args.out_dir}")

    elif args.cmd == "synth-corpus":
        from tal_asrd_tpu.data.synth import build_synth_corpus

        tr = build_synth_corpus(
            args.out_dir,
            n_episodes=args.episodes,
            episode_seconds=args.episode_seconds,
            n_speakers=args.speakers,
            seed=args.seed,
        )
        n_utts = sum(len(u) for u in tr.values())
        print(f"wrote {len(tr)} episodes ({n_utts} utterances) to {args.out_dir}")

    elif args.cmd == "synth-sad-stress":
        from tal_asrd_tpu.data.synth import build_sad_stress_corpus

        tr = build_sad_stress_corpus(
            args.out_dir,
            n_episodes=args.episodes,
            episode_seconds=args.episode_seconds,
            n_speakers=args.speakers,
            seed=args.seed,
            snr_db=(args.snr_low, args.snr_high),
            noise_rms=args.noise_rms,
        )
        n_utts = sum(len(u) for u in tr.values())
        print(f"wrote {len(tr)} stress episodes ({n_utts} utterances) "
              f"to {args.out_dir}")


if __name__ == "__main__":
    main()
