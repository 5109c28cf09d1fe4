"""End-of-round benchmark: the full BASELINE.json config matrix, END TO END.

Every configuration times the complete product path — device compute
(featurize + encoder + compiled greedy/beam) AND the host-side
finalization (n-best unpacking, detokenization, and for the LM config the
batched C++ n-gram second pass) — i.e. what a user of ``ASR`` actually
pays per batch.

Configs (BASELINE.md "configs to benchmark"):
  1. single-utterance greedy
  2. single-utterance beam bw=4
  3. batched beam bw=16 (B=128, the measured v5e throughput knee —
     tools/batch_sweep.py, PERF.md "Batch-size sweep": 2913 utts/s at
     B=128 vs 2282/2446 at B=64/256) — reported both
     serialized (per-batch latency) and SUSTAINED (batch i+1 dispatched
     before batch i's host finalization blocks, the dispatch-ahead order
     api.transcribe_wavs runs at; sustained is the HEADLINE)
  4. batched beam bw=16 + n-gram LM second pass (real ARPA via the C++
     scorer, one batched score_batch call; sustained)
  5. high-batch padded-bucket offline transcription through the public
     ASR.transcribe_wavs API (mixed 4-10 s lengths, bucketed padding)
  6. trained-weights rows (VERDICT r3 #2): the flagship overfit on short
     eos-terminated targets so the batch-wide early exit fires — the
     production decode regime (random weights never emit eos, so rows
     1-5 are 40-step worst cases)

Weather-proofing (VERDICT r3 #2): the host<->device tunnel swings
23-130 MB/s across minutes, so every TRANSFER-BOUND config (1, 2, 4, 5)
runs 3 timing trials spaced through the session and reports the median
(column RTF) plus the min/max trial, and the table carries an H2D
bandwidth probe (28 MB upload, MB/s) measured adjacent to each config —
regression vs tunnel weather is decidable from the artifact alone.
Device-bound rows (config 3, 6) stay single-trial; they are stable.

Prints ONE JSON line for the driver (config 3, end-to-end):
  {"metric": "rtf_bw16", "value": <x realtime per chip>, "unit":
   "x_realtime", "vs_baseline": value / 100.0}
vs_baseline is relative to the north-star target of 100x realtime per chip
(the reference publishes no numbers of its own — BASELINE.md).
A per-config table goes to stderr.

Sync discipline: through the axon tunnel ``block_until_ready`` is a no-op;
every timed iteration ends in an actual device->host transfer
(``np.asarray``), which the host finalization needs anyway.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

SR = 16000
NORTH_STAR_RTF = 100.0


def _mk_wavs(rng, B, secs):
    N = int(max(secs) * SR) if isinstance(secs, (list, tuple)) else int(secs * SR)
    per = (list(secs) * (B // len(secs) + 1))[:B] if isinstance(secs, (list, tuple)) \
        else [secs] * B
    wavs = (0.1 * rng.randn(B, N)).astype(np.float32)
    lens = np.array([int(s * SR) for s in per], np.int64)
    for i, l in enumerate(lens):
        wavs[i, l:] = 0.0
    return wavs, lens


def _mk_arpa(path, vocab, rng):
    """Synthetic but structurally real ARPA (unigrams + bigrams) over the
    identity vocab, loaded through the first-party C++ scorer."""
    words = [vocab.int2word[i] for i in range(4, len(vocab.int2word))]
    n_bi = min(20000, len(words) * len(words) // 2)
    bi = set()
    while len(bi) < n_bi:
        a, b = rng.randint(0, len(words), 2)
        bi.add((words[a], words[b]))
    lines = ["\\data\\", f"ngram 1={len(words) + 3}", f"ngram 2={len(bi)}",
             "", "\\1-grams:"]
    lines += ["-2.5\t<unk>\t-0.5", "-2.0\t<s>\t-0.5", "-2.2\t</s>"]
    lines += [f"{-2.0 - 2.0 * rng.rand():.4f}\t{w}\t-0.4" for w in words]
    lines += ["", "\\2-grams:"]
    lines += [f"{-1.0 - 1.5 * rng.rand():.4f}\t{a} {b}" for a, b in sorted(bi)]
    lines += ["", "\\end\\", ""]
    with open(path, "w") as f:
        f.write("\n".join(lines))


def _time_loop(fn, min_iters=3, min_secs=5.0, max_secs=60.0):
    fn()                                   # warmup (compile already done)
    iters = 0
    t0 = time.perf_counter()
    while True:
        fn()
        iters += 1
        elapsed = time.perf_counter() - t0
        if (iters >= min_iters and elapsed > min_secs) or elapsed > max_secs:
            return iters, elapsed


def _h2d_probe(jnp, mb: int = 28) -> float:
    """Achieved host->device MB/s for one large upload, synced by pulling
    8 bytes back (block_until_ready is a no-op through the tunnel).  The
    ~25-30 ms fixed round-trip cost is NOT subtracted — this is a weather
    gauge for comparing artifacts, not a pure-bandwidth figure."""
    buf = np.zeros(mb * 1024 * 1024 // 2, np.int16)
    t0 = time.perf_counter()
    np.asarray(jnp.asarray(buf)[:4])
    return mb / (time.perf_counter() - t0)


def _time_pipelined(dispatch, finalize, min_iters=3, min_secs=5.0,
                    max_secs=60.0):
    """Sustained-throughput timing: batch i+1's device work is dispatched
    BEFORE batch i's host finalization blocks — exactly the dispatch-ahead
    order the product path uses (api.transcribe_wavs chunk loop), so the
    ~25-30 ms device-tunnel round trip and the host finalization hide
    behind device compute instead of serializing after it.  Each timed
    iteration completes exactly one batch end-to-end once the 1-deep
    pipeline is primed (the priming dispatch happens in warmup)."""
    pend = dispatch()                      # warmup + prime the pipeline
    finalize(pend)
    pend = dispatch()
    iters = 0
    t0 = time.perf_counter()
    while True:
        nxt = dispatch()
        finalize(pend)
        pend = nxt
        iters += 1
        elapsed = time.perf_counter() - t0
        if (iters >= min_iters and elapsed > min_secs) or elapsed > max_secs:
            finalize(pend)                 # drain (untimed)
            return iters, elapsed


def main() -> None:
    import jax
    import jax.numpy as jnp

    from chinese_asr_tpu.utils import compile_cache
    smoke_env = bool(int(os.environ.get("CHINESE_ASR_BENCH_SMOKE", "0")))
    compile_cache.configure(os.path.dirname(os.path.abspath(__file__)),
                            cpu=smoke_env)

    from chinese_asr_tpu.api import ASR, _identity_vocab
    from chinese_asr_tpu.audio import features
    from chinese_asr_tpu.config import Config
    from chinese_asr_tpu.decode import beam, greedy
    from chinese_asr_tpu.lm import ngram
    from chinese_asr_tpu.models import las

    smoke = bool(int(os.environ.get("CHINESE_ASR_BENCH_SMOKE", "0")))
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    cfg = Config()
    if smoke:                               # CPU flow check, not a benchmark
        cfg = (cfg.with_("encoder", hidden_size=16, num_layers=2)
                  .with_("decoder", hidden_size=32, embed_dim=12)
                  .with_("attention", attn_size=8)
                  .with_("vocab", max_num_words=60)
                  .with_("decode", max_len=6))
    BIG = 8 if smoke else 128
    OFF = 16 if smoke else 256
    DUR = (0.5, 0.4) if smoke else (10.0, 9.0)
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    vocab = _identity_vocab(cfg.vocab.vocab_size)
    rng = np.random.RandomState(0)
    rows = []

    def pipeline_fn(bw, dtype=None, compact=False):
        def featurize(wavs, wav_lens):
            f, fl = features.featurize_batch(wavs, wav_lens, cfg.audio)
            return (f.astype(dtype) if dtype else f), fl

        if not bw:
            @jax.jit
            def p(params, wavs, wav_lens):
                f, fl = featurize(wavs, wav_lens)
                return greedy.greedy_decode(params, cfg, f, fl)
        elif compact:
            # no second pass -> best hypothesis selected ON DEVICE; only
            # [B, max_len] rows cross the tunnel (api.transcribe_wavs path)
            @jax.jit
            def p(params, wavs, wav_lens):
                f, fl = featurize(wavs, wav_lens)
                res = beam.beam_decode(params, cfg, bw, f, fl)
                return beam.select_best(res, cfg.decode.length_weight)
        else:
            @jax.jit
            def p(params, wavs, wav_lens):
                f, fl = featurize(wavs, wav_lens)
                return beam.beam_decode(params, cfg, bw, f, fl)
        return p

    def add_row(name, B, bw, audio_per_iter, trial_fn, trials):
        """Run `trials` timing trials of trial_fn() -> (iters, elapsed);
        record median RTF (plus min/max across trials and an H2D weather
        probe when multi-trial, i.e. transfer-bound)."""
        h2d = _h2d_probe(jnp, 2 if smoke else 28) if trials > 1 else None
        res = []
        for _ in range(1 if smoke else trials):
            iters, elapsed = trial_fn()
            per = elapsed / iters
            res.append((audio_per_iter / per, B * iters / elapsed, per))
        res.sort()
        med = res[len(res) // 2]
        rows.append((name, B, bw or 1, med[0], med[1], med[2],
                     res[0][0], res[-1][0], h2d))
        return rows[-1]

    def run_config(name, B, bw, secs, lm=None, lm_dev=None, run_params=None,
                   dtype=None, pipelined=False, trials=1):
        wavs, lens = _mk_wavs(rng, B, secs)
        wavs_d, lens_d = jnp.asarray(wavs), jnp.asarray(lens)
        compact = bool(bw) and lm is None and lm_dev is None
        p = pipeline_fn(bw, dtype, compact)
        run_params = params if run_params is None else run_params

        def dispatch():
            res = p(run_params, wavs_d, lens_d)
            if not compact and bw:
                # start the tiny fin_count transfer now so compact_nbest
                # never stalls on it (mirrors api._decode_dispatch)
                try:
                    res.fin_count.copy_to_host_async()
                except AttributeError:
                    pass
            return res

        def finalize(res):
            # host finalization INSIDE the timed region (VERDICT r1 weak #3)
            if not bw:
                out = greedy.finalize_greedy(res, vocab)
            elif compact:
                out = beam.finalize_best(res, vocab)
            elif lm_dev is not None:
                # post-hoc DEVICE second pass (compact + LM-score +
                # select on device) — superseded as the product path by
                # the fused lm_track pipeline below, kept callable
                from chinese_asr_tpu.decode import rescore as rescore_mod
                dlm2, tok2lm2, bos2, eos2 = lm_dev
                best = rescore_mod.rescore_select_jit(
                    beam.compact_nbest(res), dlm2, tok2lm2,
                    cfg.decode.lm_weight, cfg.decode.length_weight,
                    bos2, eos2)
                out = beam.finalize_best(best, vocab)
            else:
                # host second pass (api lm_mode="second_host"): device-side
                # n-best compaction, then the batched C++ rescore
                out = beam.finalize_beam(beam.compact_nbest(res), cfg, vocab,
                                         lm_model=lm,
                                         second_pass=lm is not None,
                                         lm_weight=cfg.decode.lm_weight,
                                         length_weight=cfg.decode.length_weight)
            assert len(out.pred_text) == B

        min_secs = 0.2 if smoke else (5.0 if trials == 1 else 2.5)

        def trial():
            if pipelined:
                return _time_pipelined(dispatch, finalize, min_secs=min_secs)
            return _time_loop(lambda: finalize(dispatch()),
                              min_secs=min_secs)

        return add_row(name, B, bw, float(lens.sum()) / SR, trial, trials)

    # 1-2: single utterance latency configs (transfer-bound -> 3 trials)
    run_config("single_greedy", 1, None, 0.5 if smoke else 7.0, trials=3)
    run_config("single_beam_bw4", 1, 4, 0.5 if smoke else 7.0, trials=3)

    # 3: headline — batched bw=16, end to end.  The serial row is the
    # per-batch latency (device + round trip + host finalize, strictly
    # sequential); the sustained row overlaps batch i's finalization with
    # batch i+1's device work — the dispatch-ahead order the product path
    # (api.transcribe_wavs) actually runs at, and therefore the serving
    # throughput number.
    run_config("batched_bw16", BIG, 16, list(DUR))
    headline = run_config("batched_bw16_sust", BIG, 16, list(DUR),
                          pipelined=True)

    # 4: + n-gram second pass, DEVICE rescore (decode/rescore.py, the
    # api lm_mode="second" default since round 5: LM tables in HBM,
    # selection on device, only winning rows cross the tunnel) and the
    # HOST C++ rescore (lm_mode="second_host": the n-best compaction
    # pull + one batched score_batch FFI call) — both sustained
    with tempfile.TemporaryDirectory() as td:
        arpa = os.path.join(td, "bench.arpa")
        _mk_arpa(arpa, vocab, rng)
        lm = ngram.load_lm(arpa)
        from chinese_asr_tpu.decode import lm_fused
        from chinese_asr_tpu.lm.device_ngram import DeviceNgramLM
        dlm = DeviceNgramLM.from_path(arpa)
        tok2lm_d = jnp.asarray(dlm.token_id_table(vocab))
        lm_bos, lm_eos = (int(x) for x in dlm.word_ids(["<s>", "</s>"]))

        # the api lm_mode="second" product path: decode + passive LM
        # track + rescored winner selection in ONE jitted program
        from chinese_asr_tpu.decode import rescore as rescore_mod
        wavs_r, lens_r = _mk_wavs(rng, BIG, list(DUR))
        wavs_rd, lens_rd = jnp.asarray(wavs_r), jnp.asarray(lens_r)

        @jax.jit
        def lm2p_pipe(p, w, l, dlm, tok2lm):
            f, fl = features.featurize_batch(w, l, cfg.audio)
            res, fin_lm = beam.beam_decode(
                p, cfg, 16, f, fl, lm_track=(dlm, tok2lm, lm_bos, lm_eos))
            return rescore_mod.select_rescored(
                res, fin_lm, cfg.decode.lm_weight,
                cfg.decode.length_weight)

        def lm2p_finalize(best):
            out = beam.finalize_best(best, vocab)
            assert len(out.pred_text) == BIG

        def lm2p_trial():
            return _time_pipelined(
                lambda: lm2p_pipe(params, wavs_rd, lens_rd, dlm, tok2lm_d),
                lm2p_finalize, min_secs=0.2 if smoke else 5.0)
        add_row("batched_bw16_lm2p", BIG, 16, float(lens_r.sum()) / SR,
                lm2p_trial, trials=1)
        run_config("batched_bw16_lm2p_host", BIG, 16, list(DUR), lm=lm,
                   pipelined=True, trials=3)

        # 4b (round 4): fused FIRST-pass LM decode — the n-gram tables
        # live on device (lm/device_ngram.py) and the whole LM-driven
        # beam search is one jitted while_loop (decode/lm_fused.py); the
        # same ARPA as config 4, so the two LM modes are comparable
        wavs_f, lens_f = _mk_wavs(rng, BIG, list(DUR))
        wavs_fd, lens_fd = jnp.asarray(wavs_f), jnp.asarray(lens_f)

        @jax.jit
        def lm1p_pipe(p, w, l, dlm, tok2lm):
            f, fl = features.featurize_batch(w, l, cfg.audio)
            res = lm_fused.lm_fused_decode(p, cfg, 16, f, fl, dlm,
                                           tok2lm, topn=20)
            # winner selected ON DEVICE (api lm_mode="first" path): the
            # n-best buffers never cross the tunnel — pulling + host-
            # unpacking them was ~40% of the round-4 row
            return lm_fused.select_best_first_pass(res)

        def lm1p_dispatch():
            return lm1p_pipe(params, wavs_fd, lens_fd, dlm, tok2lm_d)

        def lm1p_finalize(res):
            out = beam.finalize_best(res, vocab)
            assert len(out.pred_text) == BIG

        def lm1p_trial():
            return _time_pipelined(lm1p_dispatch, lm1p_finalize,
                                   min_secs=0.2 if smoke else 5.0)
        add_row("batched_bw16_lm1p_fused", BIG, 16,
                float(lens_f.sum()) / SR, lm1p_trial, trials=1)

    # informational: the opt-in bf16 compute path (ASR compute_dtype;
    # score arithmetic stays f32 inside decode/ — not a parity config)
    bf16_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    run_config("batched_bw16_bf16", BIG, 16, list(DUR),
               run_params=bf16_params, dtype=jnp.bfloat16, pipelined=True)

    # 5: padded-bucket offline through the public API (mixed lengths),
    # over each wire format; all upload-bound -> 3 trials + H2D probe
    mix = ([0.4, 0.5, 0.3, 0.45] if smoke else
           [4.0, 5.5, 7.0, 8.5, 10.0, 6.0, 9.0, 5.0])
    wavs, lens = _mk_wavs(rng, OFF, mix)
    # the file-ingest path ships raw PCM16 + a device-side peak gain
    # (transcribe_files); simulate it with in-memory int16 wavs
    wav_list = [(wavs[i, : lens[i]] * 32767).astype(np.int16)
                for i in range(OFF)]
    from chinese_asr_tpu.data.audio_io import peak_scale
    scales = [peak_scale(w) for w in wav_list]
    vocab_api = None
    for wire, suffix in (("flat", ""), ("mulaw", "_mulaw"),
                         ("adpcm", "_adpcm")):
        asr = ASR(cfg=cfg, bw=16, wire=wire)
        asr.params = params
        if vocab_api is not None:
            asr.vocab = vocab_api
        vocab_api = asr.vocab
        assert len(asr.transcribe_wavs(wav_list, scales=scales)) == OFF

        def api_trial(asr=asr):
            return _time_loop(
                lambda: asr.transcribe_wavs(wav_list, scales=scales),
                min_iters=2, min_secs=0.2 if smoke else 2.5)
        add_row(f"offline_api_bw16{suffix}", OFF, 16,
                float(lens.sum()) / SR, api_trial, trials=3)

    # 6: trained-weights rows (early exit fires; the production decode
    # regime).  Overfit the flagship on short eos-terminated targets
    # (tools/earlyexit_bench.py recipe), then the device-bound sustained
    # pipeline in f32 and bf16.
    from chinese_asr_tpu.train import optim
    from chinese_asr_tpu.train.step import Batch, train_step
    import functools
    TB, S, L = (4, 8, 3) if smoke else (64, 40, 12)
    t_wavs, t_lens = _mk_wavs(rng, TB, DUR[0])
    feat_fn = jax.jit(lambda w, l: features.featurize_batch(w, l, cfg.audio))
    t_feats, t_flens = feat_fn(jnp.asarray(t_wavs), jnp.asarray(t_lens))
    text = np.tile(rng.randint(4, cfg.vocab.vocab_size, size=(1, L)),
                   (TB, 1)).astype(np.int32)
    pad = np.zeros((TB, S - 1 - L), np.int32)
    tbatch = Batch(
        t_feats, t_flens,
        jnp.asarray(np.concatenate(
            [np.full((TB, 1), cfg.vocab.sos, np.int32), text, pad], 1)),
        jnp.asarray(np.concatenate(
            [text, np.full((TB, 1), cfg.vocab.eos, np.int32), pad], 1)),
        jnp.asarray(np.full(TB, L + 1, np.int32)))
    tx = optim.make_optimizer(cfg.train)
    tstep = jax.jit(functools.partial(train_step, cfg=cfg, tx=tx))
    tp, topt = params, tx.init(params)
    for i in range(8 if smoke else 300):
        tp, topt, tm = tstep(tp, topt, batch=tbatch,
                             rng=jax.random.PRNGKey(i))
    if not smoke:
        assert float(tm["accuracy"]) > 0.9, "early-exit overfit diverged"
    run_config("trained_bw16_sust", BIG, 16, list(DUR), run_params=tp,
               pipelined=True)
    tp16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tp)
    run_config("trained_bw16_bf16", BIG, 16, list(DUR), run_params=tp16,
               dtype=jnp.bfloat16, pipelined=True)

    print(f"# device={jax.devices()[0].platform}", file=sys.stderr)
    print(f"# {'config':<23}{'B':>5}{'bw':>4}{'RTF':>10}"
          f"{'utts/s/chip':>13}{'s/batch':>9}{'rtf_min':>10}"
          f"{'rtf_max':>10}{'h2d_MB/s':>10}", file=sys.stderr)
    for n, B, bw, rtf, ups, spb, lo, hi, h2d in rows:
        spread = f"{lo:>10.1f}{hi:>10.1f}" if lo != hi else " " * 20
        h2ds = f"{h2d:>10.1f}" if h2d is not None else " " * 10
        print(f"# {n:<23}{B:>5}{bw:>4}{rtf:>10.1f}{ups:>13.2f}"
              f"{spb:>9.3f}{spread}{h2ds}", file=sys.stderr)

    print(json.dumps({
        "metric": "rtf_bw16",
        "value": round(headline[3], 2),
        "unit": "x_realtime",
        "vs_baseline": round(headline[3] / NORTH_STAR_RTF, 3),
    }))


if __name__ == "__main__":
    main()
