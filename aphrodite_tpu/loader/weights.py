"""Checkpoint loading: safetensors/pt streaming -> host pytree -> sharded
device arrays.

Parity: aphrodite/modeling/model_loader/loader.py (DefaultModelLoader) +
weight_utils.py. TPU-native difference: the host pytree is placed with
`jax.device_put(param, NamedSharding(mesh, spec))` so each host only
materializes its own shards on device; quantized checkpoints are repacked
at load time by the quant method (SURVEY.md §2.6).
"""
from __future__ import annotations

import glob
import json
import os
from typing import Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aphrodite_tpu.config import LoadConfig, ModelConfig
from aphrodite_tpu.models.registry import get_model_class
from aphrodite_tpu.utils import logger


def _checkpoint_files(path: str) -> tuple[list[str], str]:
    if os.path.isdir(path):
        st = sorted(glob.glob(os.path.join(path, "*.safetensors")))
        if st:
            return st, "safetensors"
        pt = sorted(glob.glob(os.path.join(path, "*.bin"))) + \
            sorted(glob.glob(os.path.join(path, "*.pt")))
        if pt:
            return pt, "pt"
        raise FileNotFoundError(f"no checkpoint files under {path}")
    if path.endswith(".safetensors"):
        return [path], "safetensors"
    return [path], "pt"


def safetensors_iterator(files: list[str]) -> Iterator[tuple[str, np.ndarray]]:
    from safetensors import safe_open
    for f in files:
        pt = None  # lazy torch-framework handle for dtypes numpy lacks
        with safe_open(f, framework="np") as sf:
            for name in sf.keys():
                try:
                    yield name, sf.get_tensor(name)
                except Exception:
                    # float8 etc.: numpy has no such dtype — round-trip
                    # through torch and reinterpret via ml_dtypes.
                    import ml_dtypes
                    import torch
                    if pt is None:
                        pt = safe_open(f, framework="pt")
                    t = pt.get_tensor(name)
                    f8_map = {torch.float8_e4m3fn: ml_dtypes.float8_e4m3fn,
                              torch.float8_e5m2: ml_dtypes.float8_e5m2}
                    if t.dtype in f8_map:
                        yield name, t.view(torch.uint8).numpy().view(
                            f8_map[t.dtype])
                    elif t.dtype == torch.bfloat16:
                        yield name, t.view(torch.uint16).numpy().view(
                            ml_dtypes.bfloat16)
                    else:
                        yield name, t.numpy()
        if pt is not None:
            del pt


def pt_iterator(files: list[str]) -> Iterator[tuple[str, np.ndarray]]:
    import torch
    for f in files:
        state = torch.load(f, map_location="cpu", weights_only=True)
        for name, t in state.items():
            if t.dtype == torch.bfloat16:
                # numpy has no bf16; round-trip via ml_dtypes view.
                import ml_dtypes
                arr = t.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
            else:
                arr = t.numpy()
            yield name, arr


def weights_iterator(path: str) -> Iterator[tuple[str, np.ndarray]]:
    if str(path).endswith(".gguf"):
        from aphrodite_tpu.loader.gguf import gguf_weights_iterator
        return gguf_weights_iterator(path)
    files, fmt = _checkpoint_files(path)
    it = safetensors_iterator(files) if fmt == "safetensors" \
        else pt_iterator(files)
    return it


def create_model(model_config: ModelConfig):
    """Instantiate the model class for the configured architecture."""
    arch = model_config.architecture
    if arch is None:
        raise ValueError("could not determine model architecture")
    cls = get_model_class(arch)
    return cls(model_config)


def _pack_w4_leaves(params):
    """Store W4A16 weights as TRUE 4-bit in HBM: every ``{qweight(int8
    holding uint4), scales, zeros}`` leaf is repacked to
    ``qweight_packed`` uint8 [K/2, N] where byte b[i, n] carries original
    row i in its low nibble and row i + K/2 in its high nibble
    ("global-half" packing). The bandwidth-bound decode GEMM then moves
    half the bytes (round-1 verdict: "uint4-in-int8 makes W4A16 ~ W8A16";
    reference repacks at load the same way, gptq_marlin.py:329). The
    half-split (rather than nibble interleave) means the Pallas kernel
    unpacks with two aligned row-block views — no sublane shuffles
    (ops/quant_matmul_pallas.py _w4p_kernel). On the TPU backend this
    packed form is TRANSPORT only: realize_int4_leaves converts it to
    resident jnp.int4 arrays on device (round 4 — int4 crosses jit
    boundaries once the producer's output Format pins the sub-byte
    layout; see that function's docstring).

    Leaves whose K/2 does not align to the quant group stay unpacked."""
    def rec(node):
        if isinstance(node, dict):
            q = node.get("qweight")
            if q is not None and "zeros" in node and \
                    np.asarray(q).dtype == np.int8:
                q = np.asarray(q)
                K = q.shape[-2]
                G = np.asarray(node["scales"]).shape[-2]
                group = K // max(G, 1)
                # 8*group granularity: the kernel's scale blocks need >=8
                # sublanes (Mosaic tiling) and the half split must cover
                # whole blocks.
                if group > 0 and K % 2 == 0 and \
                        (K // 2) % (8 * group) == 0:
                    node = dict(node)
                    lo = q[..., :K // 2, :].astype(np.uint8)
                    hi = q[..., K // 2:, :].astype(np.uint8)
                    node["qweight_packed"] = (lo | (hi << 4)).astype(
                        np.uint8).view(np.int8)
                    del node["qweight"]
                return node
            return {k: rec(v) for k, v in node.items()}
        return node

    return rec(params)


def load_model_params(model, model_config: ModelConfig,
                      load_config: LoadConfig,
                      mesh: Optional[jax.sharding.Mesh] = None,
                      rng_seed: int = 0,
                      quant_config=None):
    """Build the on-device parameter pytree (sharded if a mesh is given).
    Quantized paths: packed GPTQ/AWQ checkpoints are repacked at load; fp
    checkpoints (or dummy weights) are quantized on the fly."""
    fmt = load_config.load_format
    if fmt in ("tensorizer", "runai_streamer", "runai_streamer_sharded"):
        # Deliberately dropped (SURVEY §2.4 loader row): both formats are
        # CUDA-ecosystem streaming loaders for S3-scale weight delivery.
        # The TPU-native equivalents are ``sharded_state`` (pre-sharded
        # per-host .safetensors + instant mmap load) and the persistent
        # XLA compile cache; safetensors itself already mmaps lazily.
        raise NotImplementedError(
            f"load_format={fmt!r} is intentionally not supported on the "
            "TPU engine: use 'sharded_state' (see "
            "loader/sharded_state.py) for fast multi-host weight "
            "delivery, or plain safetensors")
    if fmt == "sharded_state":
        from aphrodite_tpu.loader.sharded_state import load_sharded_state
        logger.info("loading pre-sharded state from %s", model_config.model)
        params = load_sharded_state(str(model_config.model))
    elif fmt == "dummy":
        if (quant_config is not None and mesh is None
                and jax.default_backend() == "tpu"
                and quant_config.method in ("gptq", "awq", "int8",
                                            "w8a16", "fp8")
                and not quant_config.lm_head_quantized):
            # Device-side generate+quantize: host-initialized dummy
            # weights cost minutes of h2d through a tunneled chip (~10
            # MB/s observed; an 8B engine spent ~8 of its 9 init minutes
            # in the transfer). Each leaf is generated AND quantized on
            # the chip, and W4 leaves come out directly in the pinned
            # int4-resident format — no transfer, no realize pass.
            return _dummy_quantized_on_device(model, quant_config,
                                              rng_seed)
        if quant_config is not None:
            # Initialize on the host CPU backend: quantization needs numpy,
            # and pulling GBs back from a (possibly tunneled) accelerator is
            # pathologically slow.
            from aphrodite_tpu.quantization.loader import (
                quantize_stacked_params)
            cpu = jax.local_devices(backend="cpu")[0]
            with jax.default_device(cpu):
                params = model.init_dummy_params(jax.random.PRNGKey(rng_seed))
            params = jax.tree.map(np.asarray, params)
            params = quantize_stacked_params(params, quant_config,
                                             model=model)
        else:
            # Initialize on the host CPU backend: jax.random.normal would
            # otherwise compile remotely for every distinct leaf shape
            # (~55 s of engine init through the tunneled compile helper);
            # the weights transfer h2d once at placement either way.
            cpu = jax.local_devices(backend="cpu")[0]
            with jax.default_device(cpu):
                params = model.init_dummy_params(jax.random.PRNGKey(rng_seed))
            params = jax.tree.map(np.asarray, params)
    elif quant_config is not None and quant_config.from_checkpoint:
        from aphrodite_tpu.quantization.loader import load_llama_quantized
        logger.info("loading %s-quantized weights from %s",
                    quant_config.method, model_config.model)
        params = load_llama_quantized(
            model, weights_iterator(model_config.model), quant_config)
    else:
        logger.info("loading weights from %s", model_config.model)
        it = weights_iterator(model_config.model)
        pre = getattr(quant_config, "preprocess", None)
        if pre is not None:
            from aphrodite_tpu.quantization import importers
            it = {"bnb4": importers.bnb4_dequant_iterator,
                  "bnb8": importers.bnb8_dequant_iterator,
                  "modelopt_fp8": importers.modelopt_fp8_dequant_iterator,
                  "nvfp4": importers.nvfp4_dequant_iterator,
                  "ct_pack8": lambda i2: importers.ct_pack8_dequant_iterator(
                      i2, symmetric=not quant_config.zero_point)}[pre](it)
            logger.info("dequantizing %s checkpoint at load", pre)
        params = model.load_weights(it)
        if quant_config is not None and quant_config.method != "dequant":
            from aphrodite_tpu.quantization.loader import (
                quantize_stacked_params)
            params = quantize_stacked_params(params, quant_config,
                                             model=model)

    params = _pack_w4_leaves(params)

    from aphrodite_tpu.parallel.mesh import model_param_specs
    specs = model_param_specs(model)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        def rec(p, s):
            if isinstance(p, dict):
                return {k: rec(v, s.get(k) if isinstance(s, dict) else None)
                        for k, v in p.items()}
            spec = s if s is not None else PartitionSpec()
            return jax.device_put(p, NamedSharding(mesh, spec))

        params = rec(params, specs)
    else:
        params = jax.tree.map(jax.device_put, params)
    if jax.default_backend() == "tpu" and mesh is None:
        params = realize_int4_leaves(params)
        params = _ensure_int4_pinned(params)
    return params


import functools as _functools


def _dummy_quantized_on_device(model, qcfg, rng_seed: int) -> dict:
    """Dummy + quantized weights generated ON DEVICE (TPU, single-chip).

    The shape tree comes from eval_shape(init_dummy_params); every leaf
    is then produced by a small per-shape jit on the chip — random bf16
    for plain leaves, fused generate+quantize (chunked per layer with
    lax.map so the fp32 intermediates never exceed one layer) for the
    quantizable stacks. gptq/awq leaves are emitted as native jnp.int4
    in the pinned resident format (_int4_format_for), so the loader's
    pack/realize passes are skipped entirely.
    Values are dummy by definition; only shapes/dtypes/layouts matter.
    """
    import jax.numpy as jnp
    from aphrodite_tpu.quantization.loader import QUANTIZABLE

    shapes = jax.eval_shape(model.init_dummy_params, jax.random.PRNGKey(0))
    if hasattr(model, "quant_targets"):
        targets = set(model.quant_targets())
    else:
        targets = {("layers", k) for k in QUANTIZABLE}
    base = jax.random.PRNGKey(rng_seed)
    counter = [0]

    @_functools.partial(jax.jit, static_argnums=(1, 2))
    def gen_plain(key, shape, dtype):
        if jnp.issubdtype(dtype, jnp.floating):
            return (0.02 * jax.random.normal(key, shape, jnp.float32)
                    ).astype(dtype)
        return jnp.zeros(shape, dtype)

    def make_q4(key, shape, g):
        L, K, N = shape
        G = K // g
        fmt = _int4_format_for(shape)

        @_functools.partial(jax.jit, out_shardings=(fmt, None, None))
        def f(key):
            def one(k):
                w = 0.02 * jax.random.normal(k, (K, N), jnp.float32)
                wg = w.reshape(G, g, N)
                wmax = jnp.max(wg, axis=1)
                wmin = jnp.min(wg, axis=1)
                scale = jnp.maximum((wmax - wmin) / 15.0, 1e-8)
                zero = jnp.clip(jnp.round(-wmin / scale), 0, 15)
                q = jnp.clip(jnp.round(wg / scale[:, None, :])
                             + zero[:, None, :], 0, 15)
                q4 = (q - 8).astype(jnp.int4).reshape(K, N)
                return q4, scale, zero - 8.0
            return jax.lax.map(one, jax.random.split(key, L))
        with _cache_bypass():
            q4, scale, zero = f(key)
        return {"qweight4": q4, "scales": scale, "zeros": zero}

    def make_q8(key, shape, fp8: bool):
        lead, (K, N) = shape[:-2], shape[-2:]
        Lf = int(np.prod(lead)) if lead else 1

        @jax.jit
        def f(key):
            def one(k):
                w = 0.02 * jax.random.normal(k, (K, N), jnp.float32)
                if fp8:
                    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0)
                                        / 448.0, 1e-8)
                    q = (w / scale[None, :]).astype(jnp.float8_e4m3fn)
                else:
                    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0)
                                        / 127.0, 1e-8)
                    q = jnp.clip(jnp.round(w / scale[None, :]), -128,
                                 127).astype(jnp.int8)
                return q, scale
            return jax.lax.map(one, jax.random.split(key, Lf))
        q, scale = f(key)
        key_name = "weight_scale" if fp8 else "scales"
        return {"qweight": q.reshape(*lead, K, N),
                key_name: scale.reshape(*lead, N)}

    def rec(node, path):
        if isinstance(node, dict):
            return {k: rec(v, path + (k,)) for k, v in node.items()}
        counter[0] += 1
        key = jax.random.fold_in(base, counter[0])
        if len(path) >= 2 and (path[-2], path[-1]) in targets \
                and node.ndim >= 3:
            if qcfg.method in ("gptq", "awq"):
                if node.ndim != 3:
                    raise NotImplementedError(
                        "w4a16 on expert stacks: follow-up (use int8/"
                        "w8a16/fp8 for MoE)")
                K = node.shape[-2]
                g = qcfg.group_size if 0 < qcfg.group_size <= K else K
                return make_q4(key, node.shape, g)
            return make_q8(key, node.shape, qcfg.method == "fp8")
        return gen_plain(key, node.shape, node.dtype)

    params = rec(shapes, ())
    params = _ensure_int4_pinned(params)
    logger.info("dummy weights generated + quantized on device (%s)",
                qcfg.method)
    return params


class _cache_bypass:
    """Temporarily disable the jax persistent compilation cache.

    The cache's keys do NOT cover sub-byte output-layout pinning
    (observed: a cached executable for the same HLO silently strips an
    out_shardings sub_byte_element_size_in_bits=4 pin, leaving int4
    arrays in the unpinned layout that the next jit boundary then tries
    to fix with a tunnel-impossible device_put). Layout-sensitive
    probe/repair compiles run under this guard."""

    def __enter__(self):
        self._prev = jax.config.jax_compilation_cache_dir
        if self._prev is not None:
            jax.config.update("jax_compilation_cache_dir", None)
            self._reset()
        return self

    def __exit__(self, *exc):
        if self._prev is not None:
            jax.config.update("jax_compilation_cache_dir", self._prev)
            self._reset()

    @staticmethod
    def _reset():
        try:
            from jax._src import compilation_cache as _cc
            _cc.reset_cache()
        except Exception:
            pass


@_functools.lru_cache(maxsize=64)
def _int4_format_for(shape):
    """The default jit-input Format for an int4 aval: an unpinned producer
    emits sub_byte_element_size_in_bits=0 metadata, which forces a relayout
    device_put at the next jit boundary (the tunnel client cannot execute
    it). Pinning the producer's out_shardings to the consumer-expected
    Format makes int4 arrays cross jit boundaries freely."""
    with _cache_bypass():
        probe = jax.jit(lambda w: w.reshape(-1)[0].astype(jnp.int32))
        aval = jax.ShapeDtypeStruct(shape, jnp.int4)
        return probe.lower(aval).compile().input_formats[0][0]


def _ensure_int4_pinned(tree):
    """Fail-fast check that every jnp.int4 leaf carries the pinned
    resident format. An unpinned S4 array is UNUSABLE: XLA forces packed
    entry layouts for S4 parameters, so the first consuming dispatch
    would attempt a relayout device_put the tunnel cannot execute (a
    RecursionError deep in dispatch). Producers avoid this by compiling
    under _cache_bypass; this check turns any regression into a clear
    error at load time instead."""
    int4 = jnp.dtype(jnp.int4)
    bad = [x.shape for x in jax.tree.leaves(tree)
           if getattr(x, "dtype", None) == int4
           and str(x.format.layout) != str(
               _int4_format_for(x.shape).layout)]
    if bad:
        raise RuntimeError(
            f"{len(bad)} int4 leaves lost their sub-byte layout pin "
            f"(shapes {bad[:3]}...): an int4-producing program compiled "
            "through the persistent cache returned an unpinned "
            "executable. Clear the cache dir "
            "(APHRODITE_COMPILE_CACHE_DIR) or set "
            "APHRODITE_DISABLE_COMPILE_CACHE=1 and retry.")
    return tree


def realize_int4_leaves(params):
    """TPU resident W4 format: unpack each ``qweight_packed`` (uint8
    global-half nibbles, [.., K/2, N]) leaf to a native ``qweight4``
    jnp.int4 [.., K, N] array ON DEVICE. Same HBM footprint, but the
    decode GEMM runs on XLA's fused int4 dot at ~380-600 GB/s effective
    weight stream vs ~280 for the nibble-arithmetic Pallas kernel
    (benchmarks/w4_kernel_lab.py; benchmarks/profile_8b_w4a16.json)."""
    import jax.numpy as jnp

    def convert(qp):
        # uint4 nibbles 0..15 shifted by -8 into the int4 range [-8, 7];
        # zeros get the same shift so (q - z) * s is unchanged.
        b = qp.astype(jnp.int32) & 0xFF
        lo = ((b & 0xF) - 8).astype(jnp.int4)
        hi = (((b >> 4) & 0xF) - 8).astype(jnp.int4)
        return jnp.concatenate([lo, hi], axis=-2)

    # Collect every packed leaf first, then convert the WHOLE set in one
    # jit (one remote compile instead of one per leaf — the tunneled
    # compile helper costs tens of seconds per program on a cold cache).
    packed: dict[tuple, object] = {}

    def collect(node, path):
        if isinstance(node, dict):
            if node.get("qweight_packed") is not None:
                packed[path] = node["qweight_packed"]
                return
            for k, v in node.items():
                collect(v, path + (k,))

    collect(params, ())
    if not packed:
        return params

    paths = sorted(packed)
    fmts = tuple(
        _int4_format_for(packed[p].shape[:-2]
                         + (packed[p].shape[-2] * 2, packed[p].shape[-1]))
        for p in paths)

    def node_at(path):
        node = params
        for k in path:
            node = node[k]
        return node

    zpaths = [p for p in paths if node_at(p).get("zeros") is not None]

    def convert_all(qps, zs):
        return (tuple(convert(q) for q in qps),
                tuple(z - 8.0 for z in zs))

    with _cache_bypass():
        q4s, zshifted = jax.jit(convert_all, out_shardings=(fmts, None))(
            tuple(packed[p] for p in paths),
            tuple(node_at(p)["zeros"] for p in zpaths))

    def rec(node, path):
        if isinstance(node, dict):
            if path in packed:
                node = dict(node)
                node["qweight4"] = q4s[paths.index(path)]
                if path in zpaths:
                    node["zeros"] = zshifted[zpaths.index(path)]
                del node["qweight_packed"]
                return node
            return {k: rec(v, path + (k,)) for k, v in node.items()}
        return node

    return rec(params, ())
