"""Dataset-level evaluation harness (reference ``test_model``,
model.py:1370-1443): decode a whole manifest with greedy and/or beam,
aggregate CER, and compare modes — the e2e parity template of SURVEY
section 4.
"""

from __future__ import annotations

import sys
import time
from typing import Dict, List, Optional

import numpy as np

from .config import Config
from .data import dataset as ds_mod
from .decode import beam as beam_mod
from .decode import greedy as greedy_mod
from .lm import ngram
from .ops.metrics import batch_cer, cer
from .vocab import Vocab


def evaluate_manifest(params, cfg: Config, vocab: Vocab, manifest_path: str,
                      bw: Optional[int] = None, lm=None,
                      lm_mode: str = "second", topn: int = 20,
                      verbose: bool = True) -> Dict:
    """Returns {"cer", "n", "pred", "ref", "seconds", "utts_per_sec"}.

    ``lm_mode``: "second" (default) rescores the acoustic n-best ON
    DEVICE (reference model.py:749-763 semantics; decode/rescore.py);
    "second_host" uses the batched C++ host scorer (reference
    model.py:755; ``lm`` must then be an NgramLM); "first" runs the
    fused on-device-LM first-pass decode (reference eval_with_lm,
    model.py:989-1360, re-designed TPU-first in decode/lm_fused.py).
    For the device modes ``lm`` may be an ARPA/.klm path, a prebuilt
    DeviceNgramLM, or an NgramLM."""
    dlm = tok2lm = None
    if lm is not None and lm_mode in ("first", "second") and bw and bw > 1:
        import jax.numpy as jnp

        from .decode import lm_fused, rescore as rescore_mod
        from .lm.device_ngram import DeviceNgramLM
        if isinstance(lm, DeviceNgramLM):
            dlm = lm
        elif isinstance(lm, ngram.NgramLM):
            dlm = (DeviceNgramLM.from_arpa(lm.path) if lm._py is not None
                   else DeviceNgramLM.from_lm(lm))
        else:
            dlm = DeviceNgramLM.from_path(lm)
        tok2lm = jnp.asarray(dlm.token_id_table(vocab))
        lm_bos, lm_eos = (int(x) for x in dlm.word_ids(["<s>", "</s>"]))
    loader = ds_mod.make_eval_loader(manifest_path, cfg, vocab)
    preds: List[str] = []
    refs: List[str] = []
    t0 = time.perf_counter()
    for b in ds_mod.batches_to_device(loader, cfg):
        feats, feat_lens = b.feats, b.feat_lens
        # ONE device->host transfer per batch; per-sample indexing of
        # device arrays costs a tunnel round-trip each
        to_np = np.asarray(b.tokens_out)
        tl_np = np.asarray(b.text_lens)
        text = [to_np[i, : tl_np[i] - 1].tolist() for i in range(len(tl_np))]
        if not bw or bw <= 1:
            res = greedy_mod.greedy_decode_jit(params, cfg, feats, feat_lens)
            out = greedy_mod.finalize_greedy(res, vocab, text=text)
        elif dlm is not None and lm_mode == "first":
            best = lm_fused.lm_fused_decode_best_jit(
                params, cfg, bw, feats, feat_lens, dlm, tok2lm, topn)
            out = beam_mod.finalize_best(best, vocab, text=text)
        elif dlm is not None:
            res = beam_mod.beam_decode_jit(params, cfg, bw, feats, feat_lens)
            best = rescore_mod.rescore_select_jit(
                beam_mod.compact_nbest(res), dlm, tok2lm,
                cfg.decode.lm_weight, cfg.decode.length_weight,
                lm_bos, lm_eos)
            out = beam_mod.finalize_best(best, vocab, text=text)
        else:
            res = beam_mod.beam_decode_jit(params, cfg, bw, feats, feat_lens)
            out = beam_mod.finalize_beam(
                res, cfg, vocab, text=text, lm_model=lm,
                second_pass=lm is not None,
                lm_weight=cfg.decode.lm_weight,
                length_weight=cfg.decode.length_weight)
        preds.extend(out.pred_text)
        refs.extend(out.text)
        if verbose:
            print(f"  {len(preds)} utts, running CER "
                  f"{batch_cer(preds, refs):.5f}", file=sys.stderr)
    dt = time.perf_counter() - t0
    return {
        "cer": batch_cer(preds, refs),
        "n": len(preds),
        "pred": preds,
        "ref": refs,
        "seconds": dt,
        "utts_per_sec": len(preds) / dt if dt > 0 else float("inf"),
    }


def compare_modes(params, cfg: Config, vocab: Vocab, manifest_path: str,
                  beam_widths=(4,), lm=None) -> Dict[str, Dict]:
    """Greedy vs beam at several widths (the reference's beam-vs-greedy
    comparison, model.py:1420-1441)."""
    out = {"greedy": evaluate_manifest(params, cfg, vocab, manifest_path,
                                       verbose=False)}
    for bw in beam_widths:
        out[f"beam{bw}"] = evaluate_manifest(params, cfg, vocab,
                                             manifest_path, bw=bw, lm=lm,
                                             verbose=False)
    return out


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description="evaluate a manifest (CER)")
    ap.add_argument("--manifest", required=True, help="path<TAB>text file")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--vocab", default=None, help="dict.pkl")
    ap.add_argument("--bw", type=int, default=None)
    ap.add_argument("--lm", default=None, help="ARPA n-gram LM")
    ap.add_argument("--lm-mode", default="second",
                    choices=("second", "second_host", "first"),
                    help="second: on-device n-best rescore; second_host: "
                         "batched C++ host rescore; first: fused "
                         "on-device-LM first-pass decode")
    args = ap.parse_args(argv)

    from .api import ASR
    asr = ASR(ckpt_path=args.ckpt, vocab=args.vocab)
    use_lm = args.lm if args.bw and args.bw > 1 else None
    lm = ngram.load_lm(use_lm) if args.lm_mode == "second_host" else use_lm
    res = evaluate_manifest(asr.params, asr.cfg, asr.vocab, args.manifest,
                            bw=args.bw, lm=lm, lm_mode=args.lm_mode)
    print(f"cer={res['cer']:.5f} n={res['n']} "
          f"utts/s={res['utts_per_sec']:.2f}")


if __name__ == "__main__":
    main()
