"""Device-mesh parallelism: SPMD sharding for decode and training.

The reference is strictly single-device (SURVEY section 2.c: no
torch.distributed / NCCL / launcher anywhere), so this module has no
translation source — it is the TPU-native expression of the same
capabilities at scale:

* **Data parallel** over ICI: the batch dim (and the flattened B*k beam dim,
  which lives inside it) is sharded across the ``data`` mesh axis; each
  utterance is independent, so the decode hot loop needs zero collectives.
* **Tensor parallel** over the ``model`` axis: the decoder's output
  projection [H+ctx, V] and the embedding [V, E] are sharded on the vocab
  dim — the two largest tensors (V=5004).  XLA inserts the psum /
  all-gather at the loss and the embedding lookup.
* Everything is ``jax.jit`` + ``NamedSharding``; no hand-written
  collectives.  Mesh layout puts ``data`` on the outer (DCN-capable) axis
  and ``model`` innermost so its collectives ride ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..train.step import Batch


def make_mesh(cfg: Config, devices=None) -> Mesh:
    """Build a (data, model) mesh from MeshConfig; data_parallel == -1 means
    "all remaining devices"."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    mp = max(1, cfg.mesh.model_parallel)
    dp = cfg.mesh.data_parallel
    if dp == -1:
        dp = n // mp
    assert dp * mp <= n, f"mesh {dp}x{mp} > {n} devices"
    if dp * mp < n and devices.reshape(-1)[0].platform != "cpu":
        # <= (not ==) exists for the oversized virtual-CPU pools the test
        # suite uses; on real hardware a smaller-than-slice mesh is almost
        # certainly a misconfiguration leaving chips idle — say so.
        import warnings
        warnings.warn(
            f"mesh {dp}x{mp} uses only {dp * mp} of {n} devices; "
            f"{n - dp * mp} chips will sit idle", stacklevel=2)
    devices = devices.reshape(-1)[: dp * mp]
    if devices[0].platform == "cpu" and dp * mp > 1:
        # XLA:CPU deadlock containment (see tests/conftest.py): serialize
        # launches.  Best-effort — fully effective only when set BEFORE the
        # CPU client exists; real TPU meshes are unaffected.
        try:
            jax.config.update("jax_cpu_enable_async_dispatch", False)
        except Exception:
            pass
    return Mesh(devices.reshape(dp, mp),
                (cfg.mesh.data_axis, cfg.mesh.model_axis))


def param_pspecs(params, cfg: Config):
    """PartitionSpec pytree: vocab-dim tensor parallelism on embedding /
    output projection, everything else replicated (a ~15M-param model needs
    no further sharding; see SURVEY section 2.c)."""
    model = cfg.mesh.model_axis

    def spec(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        name = names[-1] if names else ""
        if name == "proj_w":
            return P(None, model)
        if name == "proj_b":
            return P(model)
        if name == "embedding":
            return P(model, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def batch_pspecs(cfg: Config) -> Batch:
    d = cfg.mesh.data_axis
    return Batch(P(d), P(d), P(d), P(d), P(d))


def _named(mesh: Mesh, tree):
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), tree,
        is_leaf=lambda x: isinstance(x, P))


def shard_params(params, cfg: Config, mesh: Mesh):
    return jax.device_put(params, _named(mesh, param_pspecs(params, cfg)))


def shard_batch(batch: Batch, cfg: Config, mesh: Mesh) -> Batch:
    dp = mesh.shape[cfg.mesh.data_axis]
    B = batch.feats.shape[0]
    if B % dp:
        raise ValueError(
            f"batch size {B} does not divide the data axis ({dp}); for "
            f"mesh training build the loader with drop_last=True "
            f"(data.make_train_loader) or pad the batch to a multiple "
            f"of {dp}")
    return jax.device_put(batch, _named(mesh, batch_pspecs(cfg)))


# --------------------------------------------------------------------------
# compiled SPMD programs
# --------------------------------------------------------------------------
def make_sharded_train_step(cfg: Config, tx, params, mesh: Mesh):
    """jit the full train step over the mesh.  Param (and thus adam-moment)
    shardings follow ``param_pspecs``; the batch is data-sharded.  Call with
    host arrays or correctly-sharded device arrays."""
    from ..train import step as step_mod

    psh = _named(mesh, param_pspecs(params, cfg))
    bsh = _named(mesh, batch_pspecs(cfg))

    def fn(params, opt_state, batch, rng):
        return step_mod.train_step(params, opt_state, cfg, tx, batch, rng)

    return jax.jit(fn, in_shardings=(psh, None, bsh, None),
                   out_shardings=(psh, None, None),
                   donate_argnums=(0, 1))


def make_sharded_greedy(cfg: Config, params, mesh: Mesh):
    from ..decode import greedy as greedy_mod

    psh = _named(mesh, param_pspecs(params, cfg))
    d = NamedSharding(mesh, P(cfg.mesh.data_axis))

    def fn(params, feats, feat_lens):
        return greedy_mod.greedy_decode(params, cfg, feats, feat_lens)

    return jax.jit(fn, in_shardings=(psh, d, d))


def make_sharded_beam(cfg: Config, bw: int, params, mesh: Mesh):
    from ..decode import beam as beam_mod

    psh = _named(mesh, param_pspecs(params, cfg))
    d = NamedSharding(mesh, P(cfg.mesh.data_axis))

    def fn(params, feats, feat_lens):
        return beam_mod.beam_decode(params, cfg, bw, feats, feat_lens)

    return jax.jit(fn, in_shardings=(psh, d, d))


def make_sharded_lm_fused(cfg: Config, bw: int, params, mesh: Mesh,
                          dlm, topn: int = 20):
    """Sharded fused first-pass-LM decode (decode/lm_fused.py): the
    n-gram hash tables REPLICATE across the mesh (read-only gathers,
    no collectives) while the batch and flattened-beam dims shard over
    the data axis exactly like the acoustic beam decode."""
    from ..decode import lm_fused as lmf_mod

    psh = _named(mesh, param_pspecs(params, cfg))
    d = NamedSharding(mesh, P(cfg.mesh.data_axis))
    rep = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), (dlm,))[0]

    def fn(params, feats, feat_lens, dlm, tok2lm):
        return lmf_mod.lm_fused_decode(params, cfg, bw, feats, feat_lens,
                                       dlm, tok2lm, topn=topn)

    return jax.jit(fn, in_shardings=(psh, d, d, rep,
                                     NamedSharding(mesh, P())))


def make_sharded_lm_fused_best(cfg: Config, bw: int, params, mesh: Mesh,
                               dlm, topn: int = 20):
    """Sharded fused LM-driven decode + on-device winner selection —
    the ``ASR(lm_mode="first")`` serving fast path on a mesh: only
    [B, max_len] rows leave the devices."""
    from ..decode import lm_fused as lmf_mod

    psh = _named(mesh, param_pspecs(params, cfg))
    d = NamedSharding(mesh, P(cfg.mesh.data_axis))
    rep = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), (dlm,))[0]

    def fn(params, feats, feat_lens, dlm, tok2lm):
        res = lmf_mod.lm_fused_decode(params, cfg, bw, feats, feat_lens,
                                      dlm, tok2lm, topn=topn)
        return lmf_mod.select_best_first_pass(res)

    return jax.jit(fn, in_shardings=(psh, d, d, rep,
                                     NamedSharding(mesh, P())))


def make_sharded_beam_rescored(cfg: Config, bw: int, params, mesh: Mesh,
                               dlm, lm_bos: int, lm_eos: int):
    """Sharded fused decode + passive LM track + rescored winner
    selection — the ``ASR(lm_mode="second")`` serving fast path on a
    mesh (LM tables replicated, batch/beam dims sharded, only
    [B, max_len] winner rows leave the devices)."""
    from ..decode import beam as beam_mod
    from ..decode import rescore as rescore_mod

    psh = _named(mesh, param_pspecs(params, cfg))
    d = NamedSharding(mesh, P(cfg.mesh.data_axis))
    rep = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), (dlm,))[0]

    def fn(params, feats, feat_lens, dlm, tok2lm):
        res, fin_lm = beam_mod.beam_decode(
            params, cfg, bw, feats, feat_lens,
            lm_track=(dlm, tok2lm, lm_bos, lm_eos))
        return rescore_mod.select_rescored(
            res, fin_lm, cfg.decode.lm_weight, cfg.decode.length_weight)

    return jax.jit(fn, in_shardings=(psh, d, d, rep,
                                     NamedSharding(mesh, P())))


def make_sharded_beam_best(cfg: Config, bw: int, params, mesh: Mesh):
    """Sharded fused decode + on-device best selection — the serving fast
    path (api._decode_dispatch) on a mesh: only [B, max_len] rows leave
    the devices."""
    from ..decode import beam as beam_mod

    psh = _named(mesh, param_pspecs(params, cfg))
    d = NamedSharding(mesh, P(cfg.mesh.data_axis))

    def fn(params, feats, feat_lens):
        res = beam_mod.beam_decode(params, cfg, bw, feats, feat_lens)
        return beam_mod.select_best(res, cfg.decode.length_weight)

    return jax.jit(fn, in_shardings=(psh, d, d))
