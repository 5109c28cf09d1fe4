"""Independent numpy re-derivation of the reference decode semantics
(model.py:503-602 greedy, model.py:604-987 beam) used as the differential
oracle for the compiled JAX decoders.  Deliberately written the torch way:
beams tiled into the batch, shared tensors physically tiled and reordered
every step — the opposite of the production design — so agreement is
meaningful."""

from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp

from chinese_asr_tpu.models import las


def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def log_softmax(x):
    m = x.max(axis=1, keepdims=True)
    return x - m - np.log(np.exp(x - m).sum(axis=1, keepdims=True))


def numpy_decoder_step(params, cfg, mask, keys, values, token, cell_state, ahs):
    """One decoder step with plain numpy (LSTM cells, Bahdanau attention)."""
    dec = jax.tree_util.tree_map(np.asarray, params["decoder"])
    att = jax.tree_util.tree_map(np.asarray, params["attention"])
    x = dec["embedding"][token]
    if ahs is None:
        ahs = np.zeros((x.shape[0], values.shape[-1]), np.float32)
    x = np.concatenate([x, ahs], axis=1)
    new_states = []
    for i, p in enumerate(dec["cells"]):
        h, c = cell_state[i]
        gates = x @ p["w_ih"] + h @ p["w_hh"] + p["b_ih"] + p["b_hh"]
        H = p["w_hh"].shape[0]
        ii, f, g, o = [gates[:, j * H:(j + 1) * H] for j in range(4)]
        c2 = np_sigmoid(f) * c + np_sigmoid(ii) * np.tanh(g)
        h2 = np_sigmoid(o) * np.tanh(c2)
        new_states.append((h2, c2))
        x = h2
    last_h = new_states[-1][0]
    e = (np.tanh(keys + (last_h @ att["w_hidden"])[:, None, :]) * att["v"]).sum(-1)
    s = mask + e
    s = s - s.max(axis=1, keepdims=True)
    al = np.exp(s)
    al = al / al.sum(axis=1, keepdims=True)
    context = (al[..., None] * values).sum(axis=1)
    logit = np.concatenate([last_h, context], axis=-1) @ dec["proj_w"] + dec["proj_b"]
    return logit, context, new_states


def prologue(params, cfg, feats, feat_lens):
    eb = las.encode(params, cfg, jnp.asarray(feats), jnp.asarray(feat_lens))
    mask = np.asarray(eb.mask)
    keys, values = np.asarray(eb.keys), np.asarray(eb.values)
    if eb.init_cell_state is None:
        B = feats.shape[0]
        H = cfg.decoder.hidden_size
        z = np.zeros((B, H), np.float32)
        cell = [(z, z) for _ in range(cfg.decoder.num_layers)]
    else:
        cell = [(np.asarray(s[0]), np.asarray(s[1]))
                for s in eb.init_cell_state]
    return mask, keys, values, cell


def numpy_greedy(params, cfg, feats, feat_lens):
    mask, keys, values, cell_state = prologue(params, cfg, feats, feat_lens)
    B = feats.shape[0]
    tokens = np.full((B,), cfg.vocab.sos, np.int64)
    ahs = None
    finished = np.zeros(B, bool)
    final_lens = np.zeros(B, np.int32)
    accum = np.zeros(B, np.float32)
    outs = []
    for l in range(cfg.decode.max_len):
        logit, ahs, cell_state = numpy_decoder_step(
            params, cfg, mask, keys, values, tokens, cell_state, ahs)
        logp = log_softmax(logit)
        tokens = logp.argmax(axis=1)
        lp = logp[np.arange(B), tokens]
        outs.append(tokens.copy())
        cur = tokens == cfg.vocab.eos
        accum += np.where(~finished & cur, lp, 0.0)
        finished |= cur
        final_lens += (~finished).astype(np.int32)
        accum += np.where(~finished, lp, 0.0)
        if finished.all():
            break
    return np.stack(outs, 1), final_lens, accum, finished


def numpy_beam(params, cfg, bw, feats, feat_lens):
    """Tiled-and-reordered beam search exactly per model.py:604-941.

    Returns (finished dict b -> list[(ids, score)], hist [B*k, max_len+1],
    logp_scores [B*k], l_exit)."""
    mask, keys, values, cell_state = prologue(params, cfg, feats, feat_lens)
    B = feats.shape[0]
    k = bw
    V = cfg.vocab.vocab_size
    max_len = cfg.decode.max_len
    eos = cfg.vocab.eos

    def tile(t):
        return np.repeat(t, k, axis=0)

    mask_t, keys_t, values_t = tile(mask), tile(keys), tile(values)
    cell_state = [(tile(h), tile(c)) for h, c in cell_state]
    ahs = None
    hist = np.full((B * k, max_len + 1), cfg.vocab.pad, np.int64)
    hist[:, 0] = cfg.vocab.sos
    logp_scores = np.zeros(B * k, np.float32)
    bb_offsets = k * np.arange(B)
    finished = defaultdict(list)
    top_beam_finished = np.zeros(B, bool)

    l = 0
    for l in range(max_len):
        tokens = hist[:, l]
        logit, ahs, cell_state = numpy_decoder_step(
            params, cfg, mask_t, keys_t, values_t, tokens, cell_state, ahs)
        logit = logit / cfg.decoder.temperature
        logp = log_softmax(logit) + logp_scores[:, None]
        scores = logp.reshape(B, k * V)
        width = V if l == 0 else k * V
        order = np.argsort(-scores[:, :width], axis=1, kind="stable")[:, : 2 * k]
        cand_scores = np.take_along_axis(scores, order, axis=1)
        cand_beams = order // V
        cand_toks = order % V

        # harvest eos among top-k
        for b in range(B):
            for j in range(k):
                if cand_toks[b, j] == eos:
                    bb = cand_beams[b, j] + bb_offsets[b]
                    finished[b].append((hist[bb, 1:l + 1].tolist(),
                                        float(cand_scores[b, j])))
        top_beam_finished |= cand_toks[:, 0] == eos
        if top_beam_finished.all():
            break

        rank = np.arange(2 * k)[None, :] + (cand_toks == eos) * (2 * k)
        active = np.argsort(rank, axis=1, kind="stable")[:, :k]
        k_beams = np.take_along_axis(cand_beams, active, axis=1)
        k_toks = np.take_along_axis(cand_toks, active, axis=1)
        sel = (k_beams + bb_offsets[:, None]).reshape(-1)

        hist = hist[sel]
        hist[:, l + 1] = k_toks.reshape(-1)
        cell_state = [(h[sel], c[sel]) for h, c in cell_state]
        ahs = ahs[sel]
        logp_scores = np.take_along_axis(cand_scores, active, axis=1).reshape(-1)
        # the reference also reorders enc/mask/keys/values here
        # (model.py:913-916); rows are identical within a sample, so this is
        # a no-op and intentionally omitted.

    return dict(finished), hist, logp_scores, l
