"""Pipeline parallelism (GPipe-style) over a 'stage' mesh axis.

The reference has no pipeline parallelism (its only parallelism is
single-process nn.DataParallel, SURVEY.md §2.5); this is a beyond-parity
subsystem for the transformer families, whose depth-D stacks of identical
blocks (BIT's TransformerDecoder, ref models/help_funcs.py:170-186 with
dec_depth=8 in the '_dd8' configs) are the natural pipeline target.

TPU-native design: SPMD GPipe — all S stage-devices run the SAME program
under one ``jax.shard_map`` (manual only over the 'stage' axis; 'data' /
'model' / 'space' stay GSPMD-automatic so DPxPP composes freely):

- block parameters are stacked along a leading depth axis and sharded over
  'stage' (each device holds its D/S contiguous blocks);
- the batch is split into ``n_micro`` microbatches; a ``lax.scan`` over
  ``n_micro + S - 1`` ticks feeds microbatch ``i`` to stage 0 at tick
  ``i``, and each tick ends with a ``lax.ppermute`` ring-shift of the
  activations to the next stage (ICI neighbour traffic only);
- the last stage scatters its results into the output buffer; one final
  ``lax.psum`` over 'stage' replicates the output (every other stage
  contributes zeros).

Bubble fraction is the usual (S-1)/(n_micro+S-1); all collectives ride
ICI. Differentiable end-to-end: ppermute/psum/scan all have transposes,
so ``jax.grad`` through a pipelined forward just works — the backward is
the mirrored pipeline.

Exactness: microbatching only splits the batch dimension, so for
batch-independent blocks (LayerNorm/attention/MLP — no BatchNorm) the
pipelined forward equals the sequential one (tests/test_pipeline_parallel.py
asserts forward AND gradients match to fp32 tolerance).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def stack_params(per_block: Sequence[Any]):
    """Stack a list of identically-structured per-block param pytrees into
    one pytree whose every leaf gains a leading depth axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_block)


def _microbatch(act, n_micro: int):
    def split(a):
        b = a.shape[0]
        assert b % n_micro == 0, f"batch {b} not divisible by n_micro {n_micro}"
        return a.reshape(n_micro, b // n_micro, *a.shape[1:])
    return jax.tree_util.tree_map(split, act)


def _unmicrobatch(act):
    return jax.tree_util.tree_map(
        lambda a: a.reshape(a.shape[0] * a.shape[1], *a.shape[2:]), act)


def gpipe(block_fn: Callable[[Any, Any], Any], stacked_params, act, *,
          mesh: Mesh, n_micro: int, stage_axis: str = "stage"):
    """Apply a depth-D stack of blocks as an S-stage GPipe pipeline.

    block_fn(one_block_params, act_pytree) -> act_pytree (same structure
    and shapes; leading dim of every act leaf is the batch).
    stacked_params: pytree whose leaves have leading dim D (depth).
    Returns the pipelined equivalent of sequentially applying all D blocks.

    S = mesh.shape[stage_axis]; requires D % S == 0 and B % n_micro == 0.
    With S == 1 this reduces to a plain lax.scan over the blocks.
    """
    depth = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    s = mesh.shape[stage_axis]
    assert depth % s == 0, f"depth {depth} not divisible by {s} stages"

    def run_local_blocks(params, a):
        # params leading dim = blocks-per-stage; sequential within a stage
        def body(carry, p):
            return block_fn(p, carry), None
        a, _ = lax.scan(body, a, params)
        return a

    if s == 1:
        return run_local_blocks(stacked_params, act)

    xs = _microbatch(act, n_micro)

    def spmd(params, xs):
        stage = lax.axis_index(stage_axis)
        n_ticks = n_micro + s - 1
        # initial carries are constants, but the scan body makes them
        # stage-varying — pcast the VMA type up front (shard_map vma rule)
        vary = lambda v: lax.pcast(v, stage_axis, to="varying")
        zero_act = jax.tree_util.tree_map(
            lambda a: vary(jnp.zeros_like(a[0])), xs)
        out0 = jax.tree_util.tree_map(lambda a: vary(jnp.zeros_like(a)), xs)
        ring = [(i, (i + 1) % s) for i in range(s)]

        def tick(carry, t):
            recv, out = carry
            idx = jnp.minimum(t, n_micro - 1)
            # stage 0 reads microbatch t from the input; others consume
            # what the previous stage ppermuted to them last tick
            feed = jax.tree_util.tree_map(
                lambda b, r: jnp.where(stage == 0, b[idx], r), xs, recv)
            y = run_local_blocks(params, feed)
            # the last stage finished microbatch (t - (S-1)) this tick
            slot = t - (s - 1)
            write = jnp.logical_and(stage == s - 1, slot >= 0)
            sl = jnp.maximum(slot, 0)
            out = jax.tree_util.tree_map(
                lambda o, v: o.at[sl].set(jnp.where(write, v, o[sl])), out, y)
            nxt = jax.tree_util.tree_map(
                lambda v: lax.ppermute(v, stage_axis, ring), y)
            return (nxt, out), None

        (_, out), _ = lax.scan(tick, (zero_act, out0), jnp.arange(n_ticks))
        # only the last stage holds real values; psum replicates them
        return jax.tree_util.tree_map(lambda o: lax.psum(o, stage_axis), out)

    in_specs = (
        jax.tree_util.tree_map(lambda _: P(stage_axis), stacked_params),
        jax.tree_util.tree_map(lambda _: P(), xs),
    )
    out_specs = jax.tree_util.tree_map(lambda _: P(), xs)
    out = jax.shard_map(spmd, mesh=mesh, in_specs=in_specs,
                        out_specs=out_specs,
                        axis_names=frozenset({stage_axis}))(stacked_params, xs)
    return _unmicrobatch(out)


# ---------------------------------------------------------------------------
# Heterogeneous GPipe (VERDICT r2 item 5): per-stage DISTINCT functions,
# params and activation shapes — the mit encoder's 4 downsampling stages,
# ViG's [2,2,6,2] stacks — where the homogeneous gpipe() above cannot go.
# ---------------------------------------------------------------------------


def _flat_size(shapes) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(shapes))


def _ring_dtype(shape_trees):
    """Transport dtype for the inter-stage ring buffer: bf16 when EVERY
    boundary leaf is bf16 (native-width transport — half the inter-stage
    bandwidth), f32 otherwise (bf16/f32 mixes upcast losslessly).
    Non-float leaves are rejected loudly: an int leaf > 2^24 or a bool
    would round-trip lossily through the float ring (ADVICE r3)."""
    dtypes = {l.dtype for sh in shape_trees
              for l in jax.tree_util.tree_leaves(sh)}
    bad = {d for d in dtypes if not jnp.issubdtype(d, jnp.floating)}
    if bad:
        raise TypeError(
            "gpipe_hetero stage boundaries must be float pytrees (the "
            f"inter-stage ring transports floats); got {sorted(map(str, bad))}"
            " — cast integer/bool features before the boundary")
    if dtypes == {jnp.dtype(jnp.bfloat16)}:
        return jnp.bfloat16
    return jnp.float32


def _pack_to(tree, bmax: int, dtype=jnp.float32):
    """Flatten a pytree of arrays into one ``dtype`` vector padded to
    bmax."""
    flats = [jnp.ravel(l).astype(dtype)
             for l in jax.tree_util.tree_leaves(tree)]
    flat = jnp.concatenate(flats) if len(flats) > 1 else flats[0]
    return jnp.pad(flat, (0, bmax - flat.shape[0]))


def _unpack_from(flat, shapes, lead: int = 0):
    """Inverse of _pack_to against a pytree of ShapeDtypeStructs. With
    ``lead`` > 0, ``flat`` has that many leading (e.g. microbatch) dims
    kept intact and the element layout is sliced along the last axis."""
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    out, off = [], 0
    for l in leaves:
        n = int(np.prod(l.shape))
        sl = flat[..., off:off + n] if lead else flat[off:off + n]
        out.append(sl.reshape(flat.shape[:lead] + tuple(l.shape))
                   .astype(l.dtype))
        off += n
    return jax.tree_util.tree_unflatten(treedef, out)


def gpipe_hetero(stage_fns: Sequence[Callable[[Any, Any], Any]],
                 stage_params: Sequence[Any], act, *, mesh: Mesh,
                 n_micro: int, stage_axis: str = "stage",
                 collect_aux: bool = False):
    """S-stage GPipe over per-stage DISTINCT stage_fns/stage_params.

    stage_fns[s](stage_params[s], act_s) -> act_{s+1}; activation pytrees
    may change structure/shape/dtype at every boundary (the per-boundary
    shapes are derived once with jax.eval_shape). Inter-stage transport is
    one float ring buffer of the max boundary size — bf16 at native width
    when every boundary leaf is bf16, f32 otherwise; non-float boundaries
    are rejected (_ring_dtype) — ppermuted to the next
    stage each tick — every stage device runs the same program and
    lax.switch selects its own branch, so the pipeline stays SPMD and
    composes with GSPMD 'data'/'model' axes exactly like gpipe().

    ``collect_aux=True`` changes the stage contract to
    ``fn(p, act_s) -> (act_{s+1}, aux_s)`` and returns
    ``(final_act, [aux_0..aux_{S-1}])``. Each stage's aux stays RESIDENT
    on its own device (written into a stage-local slot buffer emitted
    through a stage-sharded output) — it never rides the ring. This is
    how the MiT encoder exposes its per-stage feature pyramid without
    re-serializing every earlier feature across every later boundary
    (r3 review finding).

    stage_params are passed replicated (every device holds all stages —
    acceptable at this zoo's param sizes; the pipeline's memory win is on
    activations). Differentiable end-to-end: switch/ppermute/scan all
    carry transposes, so jax.grad gives the mirrored backward pipeline
    (tests/test_pipeline_parallel.py pins fwd+grad equality for a
    4-stage heterogeneous chain).

    S = mesh.shape[stage_axis] must equal len(stage_fns); B % n_micro == 0.
    With S == 1 this reduces to sequentially applying the stages.
    """
    s = mesh.shape[stage_axis]
    assert len(stage_fns) == len(stage_params), "fns/params length mismatch"
    if s == 1:  # no pipeline axis: plain sequential application
        auxes = []
        for fn, p in zip(stage_fns, stage_params):
            act = fn(p, act)
            if collect_aux:
                act, aux = act
                auxes.append(aux)
        return (act, auxes) if collect_aux else act
    assert len(stage_fns) == s, (
        f"{len(stage_fns)} stages != {s} devices on '{stage_axis}'")

    xs = _microbatch(act, n_micro)
    mb_tmpl = jax.tree_util.tree_map(lambda a: a[0], xs)
    shapes = [jax.eval_shape(lambda a: a, mb_tmpl)]
    aux_shapes = []
    for fn, p in zip(stage_fns, stage_params):
        nxt = jax.eval_shape(fn, p, shapes[-1])
        if collect_aux:
            nxt, aux_sh = nxt
            aux_shapes.append(aux_sh)
        shapes.append(nxt)
    bmax = max(_flat_size(sh) for sh in shapes)
    amax = max((_flat_size(sh) for sh in aux_shapes), default=1)
    out_shapes = shapes[-1]
    # all-bf16 boundaries ride the ring at native width; mixes upcast to
    # f32; non-float boundary leaves are rejected loudly (ADVICE r3)
    rdt = _ring_dtype(shapes)
    adt = _ring_dtype(aux_shapes)

    # pre-pack the microbatched input: (n_micro, bmax)
    xs_flat = jnp.stack([
        _pack_to(jax.tree_util.tree_map(lambda a, i=i: a[i], xs), bmax, rdt)
        for i in range(n_micro)])

    def spmd(params, xs_flat):
        stage = lax.axis_index(stage_axis)
        n_ticks = n_micro + s - 1
        vary = lambda v: lax.pcast(v, stage_axis, to="varying")
        # pcast the replicated inputs to stage-varying HERE, outside the
        # scan and the per-stage lax.switch: the pcast transpose is a
        # psum over 'stage', and a psum born inside a switch branch would
        # execute on only the devices taking that branch — a mismatched
        # collective that aborts the backward (hit on XLA:CPU).
        params = jax.tree_util.tree_map(vary, params)
        xs_flat = vary(xs_flat)
        zero = vary(jnp.zeros((bmax,), rdt))
        out0 = vary(jnp.zeros((n_micro, bmax), rdt))
        aux0 = vary(jnp.zeros((n_micro, amax), adt))
        ring = [(i, (i + 1) % s) for i in range(s)]

        def branch(si):
            def run(feed_flat):
                a = _unpack_from(feed_flat, shapes[si])
                y = stage_fns[si](params[si], a)
                if collect_aux:
                    y, aux = y
                    return _pack_to(y, bmax, rdt), _pack_to(aux, amax, adt)
                return _pack_to(y, bmax, rdt), jnp.zeros((amax,), adt)
            return run

        branches = [branch(si) for si in range(s)]

        def tick(carry, t):
            recv, out, aux_out = carry
            idx = jnp.minimum(t, n_micro - 1)
            feed = jnp.where(stage == 0, xs_flat[idx], recv)
            y, aux = lax.switch(stage, branches, feed)
            slot = t - (s - 1)
            write = jnp.logical_and(stage == s - 1, slot >= 0)
            sl = jnp.maximum(slot, 0)
            out = out.at[sl].set(jnp.where(write, y, out[sl]))
            if collect_aux:
                # stage s processes microbatch (t - s) at tick t; its aux
                # stays in the device-local slot buffer — never ppermuted
                a_slot = t - stage
                a_write = jnp.logical_and(a_slot >= 0, a_slot < n_micro)
                a_sl = jnp.clip(a_slot, 0, n_micro - 1)
                aux_out = aux_out.at[a_sl].set(
                    jnp.where(a_write, aux, aux_out[a_sl]))
            nxt = lax.ppermute(y, stage_axis, ring)
            return (nxt, out, aux_out), None

        (_, out, aux_out), _ = lax.scan(tick, (zero, out0, aux0),
                                        jnp.arange(n_ticks))
        # aux emitted stage-sharded (leading axis 1 per device -> (S, ...)
        # globally); the final act still needs the psum replication
        return lax.psum(out, stage_axis), aux_out[None]

    in_specs = (jax.tree_util.tree_map(lambda _: P(), tuple(stage_params)),
                P())
    out_flat, aux_flat = jax.shard_map(
        spmd, mesh=mesh, in_specs=in_specs,
        out_specs=(P(), P(stage_axis)),
        axis_names=frozenset({stage_axis}))(tuple(stage_params), xs_flat)
    per_micro = _unpack_from(out_flat, out_shapes, lead=1)
    final = _unmicrobatch(per_micro)
    if not collect_aux:
        return final
    auxes = [
        _unmicrobatch(_unpack_from(aux_flat[si], aux_shapes[si], lead=1))
        for si in range(s)
    ]
    return final, auxes


# ---------------------------------------------------------------------------
# BIT TransformerDecoder pipelining (ref models/help_funcs.py:170-186;
# networks.py '_dd8' configs run dec_depth=8 identical cross-attn blocks).
# ---------------------------------------------------------------------------

_DEC_BLOCK_KEYS = ("norm_attn{i}", "attn{i}", "norm_ff{i}", "ff{i}")


def stack_decoder_params(dec_params, depth: int):
    """Regroup a TransformerDecoder param dict (norm_attn0, attn0, ... per
    block i) into one stacked pytree with leading depth axis, structured
    like a depth=1 TransformerDecoder's params."""
    per_block = [
        {k.format(i=0): dec_params[k.format(i=i)] for k in _DEC_BLOCK_KEYS}
        for i in range(depth)
    ]
    return stack_params(per_block)


def pipelined_decoder_apply(dec, dec_params, x, m, *, mesh: Mesh,
                            n_micro: int, stage_axis: str = "stage"):
    """Pipeline-parallel equivalent of ``TransformerDecoder.apply(x, m)``.

    ``dec`` is the (unbound) TransformerDecoder module whose ``dec_params``
    were created by a plain sequential apply/init — params are restacked on
    the fly, so existing checkpoints work unchanged. Dropout must be 0
    (BIT never uses decoder dropout, ref networks.py:307-441).
    """
    from stcd_tpu.models.bit import TransformerDecoder

    assert dec.dropout == 0.0, "pipelined decoder requires dropout=0"
    blk = TransformerDecoder(depth=1, heads=dec.heads, dim_head=dec.dim_head,
                             mlp_dim=dec.mlp_dim, dropout=0.0,
                             softmax=dec.softmax, dtype=dec.dtype)
    stacked = stack_decoder_params(dec_params, dec.depth)

    def block_fn(p, act):
        xx, mm = act
        return blk.apply({"params": p}, xx, mm), mm

    out, _ = gpipe(block_fn, stacked, (x, m), mesh=mesh, n_micro=n_micro,
                   stage_axis=stage_axis)
    return out


def changeformer_pipeline_forward(model, variables, x1, x2, *, mesh: Mesh,
                                  n_micro: int, train: bool = False,
                                  rngs=None, stage_axis: str = "stage"):
    """ChangeFormer V4/V5/V6 forward with the MiT encoder's stages run as
    a heterogeneous GPipe pipeline over ``mesh[stage_axis]`` (whose size
    must equal the encoder's stage count — 4 for V5/V6, 5 for V4).

    Thin wrapper like ``bit_pipeline_forward``: clones the model with
    ``pipeline_encoder`` set so the ONE forward implementation routes
    SegFormerEncoder through ``gpipe_hetero`` (models/changeformer.py
    SegFormerEncoder._pipelined); the decoder and every other branch stay
    the model's own code. Any checkpoint runs pipelined unchanged.
    Eval-mode equality with ``model.apply`` is pinned by
    tests/test_pipeline_parallel.py; under train, per-stage dropout keys
    fold from one base key (masks shared across microbatches — valid
    dropout, a documented deviation from the sequential RNG stream).

    Returns preds (train=False) or (preds, new_batch_stats) (train=True;
    the BatchNorms live in the decoder, outside the pipeline).
    """
    pmodel = model.clone(pipeline_encoder={
        "mesh": mesh, "n_micro": n_micro, "stage_axis": stage_axis})
    if train:
        out, mut = pmodel.apply(variables, x1, x2, True,
                                mutable=["batch_stats"], rngs=rngs)
        return out, mut["batch_stats"]
    return pmodel.apply(variables, x1, x2)


def bit_pipeline_forward(model, variables, x1, x2, *, mesh: Mesh,
                         n_micro: int, train: bool = False,
                         stage_axis: str = "stage"):
    """BASETransformer forward with the token decoder run as a GPipe
    pipeline over ``mesh[stage_axis]``.

    Thin wrapper: clones ``model`` with ``pipeline_decoder`` set, so the
    ONE forward implementation (``BASETransformer.__call__``, parity with
    ref networks.py:307-441) routes its ``transformer_decoder`` stack
    through ``pipelined_decoder_apply`` — every other branch (tokenizer
    modes, pos embeddings, token_trans, classifier) is the model's own
    code and can never drift from the sequential path. Any BASETransformer
    checkpoint runs pipelined with no conversion. Equality with
    ``model.apply`` is pinned by tests/test_pipeline_parallel.py.

    Returns logits (train=False) or (logits, new_batch_stats) (train=True).
    """
    pmodel = model.clone(pipeline_decoder={
        "mesh": mesh, "n_micro": n_micro, "stage_axis": stage_axis})
    if train:
        out, mut = pmodel.apply(variables, x1, x2, True,
                                mutable=["batch_stats"])
        return out, mut["batch_stats"]
    return pmodel.apply(variables, x1, x2)


def changevig_pipeline_forward(model, variables, x1, x2, *, mesh: Mesh,
                               n_micro: int, train: bool = False,
                               rngs=None, stage_axis: str = "stage"):
    """ChangeVIG-family (_VIGSiam: ChangeGNNV1/V2/V2Compare, VIG) forward
    with the pyramid ViG encoder's [2,2,6,2] DeepGCN stages run as a
    heterogeneous GPipe pipeline over ``mesh[stage_axis]`` (size 4) —
    VERDICT r3 item 6; ref models/pyramid_vig.py:103-174.

    Thin wrapper like ``changeformer_pipeline_forward``: clones the model
    with ``pipeline_encoder`` set so the ONE forward implementation
    routes VIGBackbone through ``gpipe_hetero``
    (models/changevig.py VIGBackbone._pipelined); the decoder and every
    other branch stay the model's own code — any checkpoint runs
    pipelined unchanged. Inside the pipelined encoder the stages run
    train=False (frozen BN running stats, DropPath off — the documented
    deviation in VIGBackbone.pipeline); the decoder keeps full train-mode
    BN, so train=True still returns updated (decoder) batch_stats.

    Returns preds (train=False) or (preds, new_batch_stats) (train=True).
    """
    pmodel = model.clone(pipeline_encoder={
        "mesh": mesh, "n_micro": n_micro, "stage_axis": stage_axis})
    if train:
        out, mut = pmodel.apply(variables, x1, x2, True,
                                mutable=["batch_stats"], rngs=rngs)
        return out, mut["batch_stats"]
    return pmodel.apply(variables, x1, x2)
