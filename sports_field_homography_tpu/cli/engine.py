"""Shared model-construction + jitted-apply plumbing for the CLIs.

Centralizes what the reference repeats across train/predict/test mains
(``train.py:328-475``, ``predict.py:125-256``, ``test.py:11-64``): build
the Reconstructor from parsed args, load court constants, restore a
checkpoint, and expose jitted apply functions with static batch shapes.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..data.assets import open_court_template, open_court_poi
from ..models import Reconstructor, ReconstructorConfig
from ..utils.checkpoint import load_checkpoint

__all__ = ["build_model", "ModelBundle", "jit_predict_fn", "jit_forward_fn"]


def _dtype_from_str(name: str):
    return {"bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
            "float32": jnp.float32, "f32": jnp.float32}[str(name)]


@dataclass
class ModelBundle:
    model: Reconstructor
    variables: Dict[str, Any]
    court_img: Any          # host numpy (device_put at use sites)
    court_poi: Any
    config: ReconstructorConfig


def _enable_persistent_compile_cache():
    """Persist XLA compilations across CLI invocations (compiles through
    the tunneled TPU runtime can take minutes)."""
    try:
        if jax.config.jax_compilation_cache_dir is None:
            cache = os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))), ".jax_cache"))
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass


def build_model(args, load: Optional[str] = None,
                warp_with_nearest: bool = False,
                batch_size: Optional[int] = None,
                init_if_missing: bool = True,
                seed: int = 0,
                fold_bn: bool = False) -> ModelBundle:
    """Construct Reconstructor + court constants from parsed CLI args."""
    _enable_persistent_compile_cache()
    bs = batch_size if batch_size is not None else args.batchsize
    cfg = ReconstructorConfig(
        target_size=tuple(args.target_size),
        mask_classes=args.mask_classes,
        use_unet=args.use_unet,
        unet_bilinear=args.unet_bilinear,
        unet_size=tuple(args.unet_size),
        unet_uv=getattr(args, "unet_uv", False),
        use_resnet=args.use_resnet,
        resnet_name=args.resnet_name,
        resnet_input=args.resnet_input,
        use_warper=args.use_warper,
        warp_size=tuple(args.warp_size),
        warp_with_nearest=warp_with_nearest,
        warp_kernel=getattr(args, "warp_kernel", "auto"),
        conv_kernel=getattr(args, "conv_kernel", "auto"),
        fused_bn=getattr(args, "fused_bn", False),
    )
    dtype = _dtype_from_str(getattr(args, "compute_dtype", "bfloat16"))
    model = Reconstructor(cfg, dtype=dtype)

    from ..utils.config import resolve_asset
    court_img = open_court_template(resolve_asset(args.court_img),
                                    num_classes=args.mask_classes,
                                    size=args.court_size, batch_size=bs)
    court_poi = open_court_poi(resolve_asset(args.court_poi), bs)

    variables = None
    if load is not None:
        if load.endswith(".pth"):
            variables = load_checkpoint(load, unet_bilinear=cfg.unet_bilinear)
        else:
            target = _init_variables(model, cfg, court_img, court_poi, bs, seed)
            variables = load_checkpoint(load, target=target,
                                        unet_bilinear=cfg.unet_bilinear)
    elif init_if_missing:
        variables = _init_variables(model, cfg, court_img, court_poi, bs, seed)
    if fold_bn and variables is not None and variables.get("batch_stats"):
        # inference-only: fold running BN stats into the conv weights and
        # switch the model's BatchNorms to the degenerate x+bias path
        # (exactly equivalent — see ops/fold_bn.py)
        from ..ops.fold_bn import fold_batchnorm
        variables = fold_batchnorm(variables)
        model = model.clone(bn_folded=True)
    if variables is not None:
        # commit params to device ONCE: host-numpy params (e.g. from
        # msgpack) would otherwise re-upload ~200 MB on every jit call
        variables = jax.device_put(variables)
    return ModelBundle(model, variables, court_img, court_poi, cfg)


def _init_variables(model, cfg, court_img, court_poi, bs, seed):
    w, h = cfg.target_size
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    ci1 = jnp.asarray(court_img[:1])
    cp1 = jnp.asarray(court_poi[:1])
    # jit the init: eager tracing executes op-by-op on device (very slow
    # through the TPU tunnel); one compiled program is ~100x faster.
    return jax.jit(lambda: model.init(jax.random.PRNGKey(seed), x,
                                      ci1, cp1, train=False))()


def jit_predict_fn(bundle: ModelBundle, consistency: bool, project_poi: bool,
                   keep=None, mesh=None):
    """Jitted ``Reconstructor.predict`` with static output pruning.

    ``keep``: tuple of output keys to return (None = all).  Pruning inside
    the jit matters twice: XLA dead-code-eliminates the pruned compute
    (e.g. the full-res warp when only theta is requested), and — critical
    on tunneled runtimes that ship jit outputs eagerly — the 100+ MB
    logits/warp_mask buffers never cross the wire (measured 7.5 s/batch
    -> 0.2 s/batch for the theta+consistency config at out_size 1280x720).

    ``mesh``: an optional ``jax.sharding.Mesh`` with a leading ``data``
    axis.  When given, the input batch is constrained to ``P('data')``
    (pure data-parallel inference, no collectives) and the court constants
    + interval warp table are replicated across the mesh.  Single-chip and
    multi-chip inference share this one jitted body, so every device-side
    optimization (uint8 /255, gather-free warp, argmax narrowing, keep
    pruning) applies identically on both paths.
    """
    model = bundle.model
    in_sharding = repl = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        in_sharding = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
    court_img = jax.device_put(bundle.court_img, repl)
    court_poi = jax.device_put(bundle.court_poi, repl)

    # Interval-encode the template for the gather-free nearest warp
    # (ops/interval_warp): bit-exact and ~20x faster than the XLA gather.
    warp_table = None
    if bundle.config.use_warper and bundle.config.warp_with_nearest:
        try:
            from ..ops.interval_warp import build_interval_table
            # bundle.court_img is host numpy — no D2H here
            warp_table = build_interval_table(bundle.court_img)
            if repl is not None:
                warp_table = jax.device_put(warp_table, repl)
        except (ValueError, AssertionError) as e:
            print(f"interval warp unavailable ({e}); using gather warp")

    # court constants ride as jit ARGUMENTS, not closures
    @jax.jit
    def _fn(variables, x, ci, cp, wt):
        if in_sharding is not None:
            x = jax.lax.with_sharding_constraint(x, in_sharding)
        if x.dtype == jnp.uint8:       # device-side normalization (u8/255)
            # true division: x*(1/255) differs in the last ulp
            x = x.astype(jnp.float32) / 255.0
        # when warp_mask is kept it cannot be DCE'd, so share its full-res
        # warp with the consistency labels (bit-equal; see predict)
        share_warp = (consistency and keep is not None
                      and "warp_mask" in keep)
        preds = model.apply(variables, x, ci, cp,
                            consistency=consistency, project_poi=project_poi,
                            warp_table=wt,
                            score_from_warp_mask=share_warp,
                            method=model.predict)
        # device-side compaction: argmax the logits into a uint8 label mask
        # and narrow the warp labels to uint8 — an 8x/4x cut in D2H bytes
        # (the reference does the argmax in its transfer worker,
        # predict.py:94-99; on TPU it belongs in the jitted program)
        if keep is not None and "segm_mask" in keep and "logits" in preds:
            preds["segm_mask"] = jnp.argmax(
                preds["logits"], axis=-1).astype(jnp.uint8)
        if "warp_mask" in preds:
            preds["warp_mask"] = preds["warp_mask"].astype(jnp.uint8)
        if keep is not None:
            preds = {k: v for k, v in preds.items() if k in keep}
        return preds

    def fn(variables, x):
        return _fn(variables, x, court_img, court_poi, warp_table)
    return fn


def jit_forward_fn(bundle: ModelBundle, train: bool):
    model = bundle.model
    court_img = jax.device_put(bundle.court_img)
    court_poi = jax.device_put(bundle.court_poi)

    @jax.jit
    def _fn(variables, x, ci, cp):
        return model.apply(variables, x, ci, cp, train=train,
                           mutable=["batch_stats"] if train else False)

    def fn(variables, x):
        return _fn(variables, x, court_img, court_poi)
    return fn


def discover_conf(load_path: Optional[str], conf_path: Optional[str]):
    """Sidecar conf.yaml discovery next to the checkpoint
    (reference ``predict.py:138-141``)."""
    if conf_path is None and load_path is not None:
        conf_path = os.path.join(os.path.dirname(load_path), "conf.yaml")
    if conf_path is not None and not os.path.isfile(conf_path):
        conf_path = None
    return conf_path
