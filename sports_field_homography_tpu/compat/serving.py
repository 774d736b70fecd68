"""Self-contained serving artifacts via ``jax.export`` (StableHLO).

The reference serves by unpickling a ``.pth`` into Python model code
(``predict.py:195-208``); the TPU-native production analog is an
ahead-of-time *serialized program*: the jitted predict function —
weights, court constants and the interval warp table baked in as
constants — exported to StableHLO bytes that any PjRt runtime (C++,
serving containers, future jax versions) can load and run **without this
package's model code or checkpoint files**.

Artifact layout (one directory):
  * ``program.shlo``  — ``jax.export`` serialization of
    ``predict(x: uint8/float32 [B,H,W,3]) -> {theta, score, ...}``
  * ``meta.json``     — input spec, output names, platforms, config echo

Round-trips through :func:`load_serving`, which returns a callable with
the same signature; ``tests/test_serving_export.py`` asserts bit-equal
outputs vs the live model.
"""
from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

__all__ = ["export_predict", "save_serving", "load_serving"]

_PROGRAM = "program.shlo"
_META = "meta.json"


def export_predict(bundle, consistency: bool, project_poi: bool,
                   keep: Optional[Sequence[str]], batch_size: int,
                   platforms: Optional[Sequence[str]] = None,
                   input_dtype: str = "uint8",
                   poly_batch: bool = False):
    """Export the jitted predict program with everything baked in.

    ``bundle``: a ``cli.engine.ModelBundle`` (params restored, BN folded as
    desired).  ``platforms``: lowering targets (e.g. ``["tpu"]``,
    ``["tpu", "cpu"]``); None = the current default backend.

    ``poly_batch``: export with a SYMBOLIC batch dimension — ONE artifact
    serves any batch size (the runtime specializes/compiles per concrete
    batch at call time).  The court constants enter the program batch-1
    and broadcast (models/reconstructor._match_batch); ``batch_size`` is
    recorded in meta as the recommended size only.

    Weight storage: when the model computes in bfloat16, the baked float
    params are stored as bf16 — **bit-identical outputs on TPU** (the
    MXU rounds params to bf16 at use either way; measured exactly equal
    on the flagship config, theta/score/poi max-abs-diff 0.0) at half
    the artifact size.  CPU backends may elide the cast into the conv
    and keep extra precision (~1e-6 deltas).  f32-compute models keep
    f32 weights.

    Returns ``(jax.export.Exported, meta dict)``.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from ..cli.engine import jit_predict_fn

    if poly_batch:
        bundle = dataclasses.replace(
            bundle, court_img=np.asarray(bundle.court_img)[:1],
            court_poi=np.asarray(bundle.court_poi)[:1])
    weights_dtype = "float32"
    if bundle.model.dtype == jnp.bfloat16:
        weights_dtype = "bfloat16"
        host = jax.device_get(bundle.variables)
        cast = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if np.issubdtype(np.asarray(a).dtype, np.floating) else a, host)
        bundle = dataclasses.replace(bundle, variables=cast)
    fn = jit_predict_fn(bundle, consistency=consistency,
                        project_poi=project_poi,
                        keep=tuple(keep) if keep is not None else None)
    variables = bundle.variables

    # weights/constants ride as closure constants -> embedded in the
    # StableHLO module; the exported signature is x -> preds
    serve = jax.jit(lambda x: fn(variables, x))

    w, h = bundle.config.target_size
    dtype = {"uint8": jnp.uint8, "float32": jnp.float32}[input_dtype]
    if poly_batch:
        (b,) = jax_export.symbolic_shape("b")
        x_spec = jax.ShapeDtypeStruct((b, h, w, 3), dtype)
    else:
        x_spec = jax.ShapeDtypeStruct((batch_size, h, w, 3), dtype)

    exported = jax_export.export(
        serve, platforms=tuple(platforms) if platforms else None)(x_spec)

    # flattened-order output names: unflatten indices through the out_tree
    idx_by_name = exported.out_tree.unflatten(
        range(exported.out_tree.num_leaves))
    flat_names = [None] * exported.out_tree.num_leaves
    for name, i in idx_by_name.items():
        flat_names[i] = name
    out_names = sorted(flat_names)
    meta = {
        "format": "jax.export/stablehlo",
        "calling_convention_version":
            int(exported.calling_convention_version),
        "platforms": list(exported.platforms),
        "weights_dtype": weights_dtype,
        "input": {"shape": ["b" if poly_batch else batch_size, h, w, 3],
                  "dtype": input_dtype,
                  "layout": "NHWC",
                  "poly_batch": bool(poly_batch),
                  "recommended_batch": int(batch_size),
                  "note": "uint8 inputs are normalized (x/255) in-program"},
        "outputs": list(out_names),
        "config": {
            "target_size": list(bundle.config.target_size),
            "unet_size": list(bundle.config.unet_size),
            "warp_size": list(bundle.config.warp_size),
            "mask_classes": int(bundle.config.mask_classes),
            "resnet_name": bundle.config.resnet_name,
            "resnet_input": bundle.config.resnet_input,
            "consistency": bool(consistency),
            "project_poi": bool(project_poi),
        },
    }
    meta["_flat_outputs"] = [
        {"name": n, "dtype": str(a.dtype), "shape": [str(d) for d in a.shape]}
        for n, a in zip(flat_names, exported.out_avals)]
    meta["_input_spec"] = {"dtype": input_dtype,
                           "shape": [str(d) for d in x_spec.shape]}
    return exported, meta


def save_serving(dst_dir: str, exported, meta: dict) -> str:
    """Write the artifact directory.

    Always: ``program.shlo`` (jax.export serialization; load_serving) +
    ``meta.json``.  For fixed-batch artifacts, additionally the sidecars
    the C++ PJRT runtime (``cpp/pjrt_serve.cc``) consumes directly —
    no Python anywhere:
      * ``module.mlir.bc``      — raw StableHLO bytecode of the program
      * ``compile_options.pb``  — serialized xla.CompileOptionsProto
      * ``io_spec.txt``         — one line per argument/result:
        ``input <dtype> <d0,d1,...>`` / ``output <name> <dtype> <dims>``
        in the program's flattened calling order.
    (Symbolic-batch and multi-platform artifacts skip the sidecars: PJRT
    compiles concrete single-platform programs; use jax's load_serving
    for those.)
    """
    meta = dict(meta)
    flat_outputs = meta.pop("_flat_outputs", None)
    input_spec = meta.pop("_input_spec", None)
    os.makedirs(dst_dir, exist_ok=True)
    with open(os.path.join(dst_dir, _PROGRAM), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(dst_dir, _META), "w") as f:
        json.dump(meta, f, indent=2)

    poly = bool(meta.get("input", {}).get("poly_batch"))
    # multi-platform modules take a leading platform-index argument in the
    # raw MLIR (jax.export calling convention), which the single-input C++
    # runtime does not speak — sidecars are single-platform, fixed-batch
    multi = len(meta.get("platforms", [])) > 1
    if not poly and not multi and flat_outputs is not None \
            and input_spec is not None:
        with open(os.path.join(dst_dir, "module.mlir.bc"), "wb") as f:
            f.write(exported.mlir_module_serialized)
        from jax._src.lib import xla_client
        co = xla_client.CompileOptions()
        co.num_replicas = 1
        co.num_partitions = 1
        with open(os.path.join(dst_dir, "compile_options.pb"), "wb") as f:
            f.write(co.SerializeAsString())
        lines = ["input {} {}".format(input_spec["dtype"],
                                      ",".join(input_spec["shape"]))]
        for o in flat_outputs:
            lines.append("output {} {} {}".format(
                o["name"], o["dtype"], ",".join(o["shape"])))
        with open(os.path.join(dst_dir, "io_spec.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
    return dst_dir


def load_serving(src_dir: str):
    """Load a serving artifact -> ``(callable, meta)``.

    The callable takes one array ``x`` with the artifact's input spec and
    returns the predict output dict.  No model code or checkpoint is
    touched: the program (weights included) deserializes from bytes and
    runs under ``jax.jit`` on any platform the artifact was lowered for.
    """
    import jax
    from jax import export as jax_export

    with open(os.path.join(src_dir, _PROGRAM), "rb") as f:
        exported = jax_export.deserialize(f.read())
    with open(os.path.join(src_dir, _META)) as f:
        meta = json.load(f)

    call = jax.jit(exported.call)

    def fn(x: np.ndarray):
        return call(x)

    return fn, meta
