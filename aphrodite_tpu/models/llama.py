"""Llama-family decoder (Llama 1/2/3, TinyLlama, Mistral, Qwen2 via knobs).

Pure-functional JAX: parameters are stacked per-layer arrays ``[L, ...]`` and
the forward pass is a single ``lax.scan`` over layers — one traced layer body
regardless of depth, so compile time stays flat across shape buckets and the
paged KV cache threads through the scan as xs/ys (XLA keeps the donated
buffer in place).

Behavioral parity: aphrodite/modeling/models/llama.py:96-449 (LlamaAttention /
LlamaForCausalLM); TP sharding replaces the reference's
QKVParallelLinear/RowParallelLinear with PartitionSpec annotations on the
weight leaves (psum is inserted by GSPMD).
"""
from __future__ import annotations

from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.attention import AttentionMetadata, paged_attention, write_kv
from aphrodite_tpu.config import ModelConfig
from aphrodite_tpu.layers.common import ACT2MUL, rms_norm
from aphrodite_tpu.layers.linear import apply_linear
from aphrodite_tpu.layers.rotary import (RopeConfig, apply_rope,
                                         compute_cos_sin, compute_inv_freq,
                                         longrope_orig_max)
from aphrodite_tpu.utils import jax_dtype


class LlamaForCausalLM:
    """Also serves Mistral (sliding window) and, with bias knobs, Qwen2."""

    # Knobs subclasses flip.
    qkv_bias: bool = False
    tie_embeddings_default: bool = False

    # Pipeline parallelism (set by the worker): stages shard the [L, ...]
    # layer stack / KV cache over the `pp` mesh axis; see _pipeline.
    pp_size: int = 1
    mesh = None
    # Sequence parallelism (set by the worker): residual-stream activations
    # constrained to P("tp") on the token dim; XLA then reduce-scatters the
    # TP matmul outputs and runs norms/elementwise token-sharded.
    sequence_parallel: bool = False

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.text_config
        self.dtype = jax_dtype(config.dtype)
        self.hidden_size = config.hidden_size
        self.num_layers = config.num_layers
        self.num_heads = config.num_attention_heads
        self.num_kv_heads = config.num_kv_heads
        self.head_dim = config.head_dim
        self.intermediate_size = hf.intermediate_size
        self.vocab_size = config.vocab_size
        self.rms_eps = getattr(hf, "rms_norm_eps", 1e-6)
        self.sliding_window = config.sliding_window
        self.scale = self.head_dim ** -0.5
        self.act = ACT2MUL[getattr(hf, "hidden_act", "silu")]
        self.tie_embeddings = getattr(hf, "tie_word_embeddings",
                                      self.tie_embeddings_default)
        self.qkv_bias = getattr(hf, "attention_bias", self.qkv_bias)
        self.rope = RopeConfig.from_hf_config(hf, self.head_dim)
        inv_freq, mscale = compute_inv_freq(self.rope)
        self._inv_freq = jnp.asarray(inv_freq)
        self._rope_mscale = mscale
        self._longrope_orig_max = longrope_orig_max(self.rope)
        # Quantization format for the linear weights ("w4a16" / "int8" /
        # "w8a16" / "fp8"); None = full precision. Set by the worker.
        self.quant_fmt = None

    def set_quant_config(self, qcfg) -> None:
        from aphrodite_tpu.quantization.base import runtime_format
        self.quant_fmt = runtime_format(qcfg)

    # ------------------------------------------------------------------ params
    def _layer_shapes(self) -> dict[str, tuple]:
        H, nq, nkv, hd, I = (self.hidden_size, self.num_heads,
                             self.num_kv_heads, self.head_dim,
                             self.intermediate_size)
        L = self.num_layers
        shapes = {
            "input_norm": (L, H),
            "wq": (L, H, nq * hd),
            "wk": (L, H, nkv * hd),
            "wv": (L, H, nkv * hd),
            "wo": (L, nq * hd, H),
            "post_norm": (L, H),
            "w_gate": (L, H, I),
            "w_up": (L, H, I),
            "w_down": (L, I, H),
        }
        if self.qkv_bias:
            shapes.update(bq=(L, nq * hd), bk=(L, nkv * hd), bv=(L, nkv * hd))
        return shapes

    def init_dummy_params(self, rng: jax.Array) -> dict:
        def mk(key, shape, scale=0.02):
            return (scale * jax.random.normal(key, shape, jnp.float32)
                    ).astype(self.dtype)

        keys = iter(jax.random.split(rng, 64))
        layers = {}
        for name, shape in self._layer_shapes().items():
            if "norm" in name:
                layers[name] = jnp.ones(shape, self.dtype)
            elif name.startswith("b"):
                layers[name] = jnp.zeros(shape, self.dtype)
            else:
                layers[name] = mk(next(keys), shape)
        params = {
            "embed": mk(next(keys), (self.vocab_size, self.hidden_size)),
            "layers": layers,
            "final_norm": jnp.ones((self.hidden_size,), self.dtype),
        }
        if not self.tie_embeddings:
            params["lm_head"] = mk(next(keys),
                                   (self.hidden_size, self.vocab_size))
        return params

    # HF checkpoint name -> (param key, needs_transpose)
    _HF_LAYER_MAP = {
        "self_attn.q_proj.weight": ("wq", True),
        "self_attn.k_proj.weight": ("wk", True),
        "self_attn.v_proj.weight": ("wv", True),
        "self_attn.o_proj.weight": ("wo", True),
        "self_attn.q_proj.bias": ("bq", False),
        "self_attn.k_proj.bias": ("bk", False),
        "self_attn.v_proj.bias": ("bv", False),
        "mlp.gate_proj.weight": ("w_gate", True),
        "mlp.up_proj.weight": ("w_up", True),
        "mlp.down_proj.weight": ("w_down", True),
        "input_layernorm.weight": ("input_norm", False),
        "post_attention_layernorm.weight": ("post_norm", False),
    }

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        """Stack per-layer HF tensors into [L, ...] host buffers."""
        np_dtype = np.dtype(jnp.dtype(self.dtype).name) \
            if self.dtype != jnp.bfloat16 else None
        import ml_dtypes
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np_dtype

        layer_bufs = {
            name: np.zeros(shape, dtype=target)
            for name, shape in self._layer_shapes().items()
        }
        params: dict = {"layers": layer_bufs}
        kv_scales = None  # calibrated per-layer fp8 KV scales, if shipped
        seen = set()
        for name, w in weights:
            if name.endswith("rotary_emb.inv_freq"):
                continue
            w = np.asarray(w)
            if name == "model.embed_tokens.weight":
                params["embed"] = w.astype(target)
            elif name == "model.norm.weight":
                params["final_norm"] = w.astype(target)
            elif name == "lm_head.weight":
                if not self.tie_embeddings:
                    params["lm_head"] = w.T.astype(target)
            elif name.startswith("model.layers."):
                rest = name[len("model.layers."):]
                idx_str, sub = rest.split(".", 1)
                leaf = sub.rsplit(".", 1)[-1]
                if "self_attn" in sub and leaf in ("k_scale", "v_scale",
                                                   "kv_scale"):
                    # Calibrated KV-cache scales (reference
                    # aphrodite/quantization/kv_cache.py:10; kv_scale is
                    # the legacy combined form). Stored per layer and
                    # folded into q / the attention output at apply time.
                    if kv_scales is None:
                        kv_scales = {"k": np.ones((self.num_layers,),
                                                  np.float32),
                                     "v": np.ones((self.num_layers,),
                                                  np.float32)}
                    val = float(w.reshape(-1)[0])
                    if leaf in ("k_scale", "kv_scale"):
                        kv_scales["k"][int(idx_str)] = val
                    if leaf in ("v_scale", "kv_scale"):
                        kv_scales["v"][int(idx_str)] = val
                    seen.add(name)
                    continue
                mapped = self._HF_LAYER_MAP.get(sub)
                if mapped is None:
                    continue
                key, transpose = mapped
                if key not in layer_bufs:
                    continue
                layer_bufs[key][int(idx_str)] = (
                    w.T if transpose else w).astype(target)
            seen.add(name)
        if kv_scales is not None and (np.any(kv_scales["k"] != 1.0)
                                      or np.any(kv_scales["v"] != 1.0)):
            layer_bufs["kv_k_scale"] = kv_scales["k"]
            layer_bufs["kv_v_scale"] = kv_scales["v"]
        if "embed" not in params:
            raise ValueError("checkpoint missing model.embed_tokens.weight")
        return params

    def param_specs(self) -> dict:
        layers = {
            "input_norm": P(), "post_norm": P(),
            "wq": P(None, None, "tp"), "wk": P(None, None, "tp"),
            "wv": P(None, None, "tp"), "wo": P(None, "tp", None),
            "w_gate": P(None, None, "tp"), "w_up": P(None, None, "tp"),
            "w_down": P(None, "tp", None),
        }
        if self.quant_fmt is not None:
            # Quantized leaves are dicts: qweight shards like the fp weight;
            # scale-like tensors shard on their output dim.
            def qspec(wspec):
                out_axis = wspec[2]  # None or "tp" on the output dim
                in_axis = wspec[1]
                d = {"qweight": wspec}
                if self.quant_fmt == "w4a16":
                    d["qweight_packed"] = wspec
                    d["qweight4"] = wspec
                    d["scales"] = P(None, None, out_axis)
                    d["zeros"] = P(None, None, out_axis)
                elif self.quant_fmt.startswith("fp8"):
                    d["weight_scale"] = P(None, out_axis)
                    d["weight_scale_block"] = P(None, None, out_axis)
                    d["input_scale"] = P(None)
                else:
                    d["scales"] = P(None, out_axis)
                return d
            for k in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
                layers[k] = qspec(layers[k])
        if self.qkv_bias:
            layers.update(bq=P(None, "tp"), bk=P(None, "tp"),
                          bv=P(None, "tp"))
        specs = {
            "embed": P("tp", None),
            "layers": layers,
            "final_norm": P(),
        }
        if not self.tie_embeddings:
            specs["lm_head"] = P(None, "tp")
        return specs

    def maybe_merge_params(self, params: dict) -> dict:
        """Fuse QKV and gate/up into single GEMMs. Decode is weight-
        bandwidth-bound; fewer, fatter GEMMs stream measurably better
        (~9% step time on v5e). Mirrors the reference's QKVParallelLinear /
        MergedColumnParallelLinear fusion (aphrodite/modeling/layers/
        linear.py:377) as a load-time tensor merge. Skipped for quantized
        checkpoints (per-projection scale tensors), TP>1 (head-aligned
        sharding), PP, and models overriding the base forward."""
        if self.quant_fmt is not None or self.pp_size > 1:
            return params
        if self.mesh is not None:
            sizes = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
            if sizes.get("tp", 1) > 1:
                return params
        if type(self).apply is not LlamaForCausalLM.apply:
            return params
        layers = dict(params["layers"])
        if all(k in layers for k in ("wq", "wk", "wv")) and \
                all(not isinstance(layers[k], dict)
                    for k in ("wq", "wk", "wv")):
            layers["w_qkv"] = jnp.concatenate(
                [layers.pop("wq"), layers.pop("wk"), layers.pop("wv")],
                axis=-1)
            if "bq" in layers:
                layers["b_qkv"] = jnp.concatenate(
                    [layers.pop("bq"), layers.pop("bk"), layers.pop("bv")],
                    axis=-1)
        if "w_gate" in layers and "w_up" in layers and \
                type(self)._mlp is LlamaForCausalLM._mlp and \
                not isinstance(layers["w_gate"], dict):
            layers["w_gate_up"] = jnp.concatenate(
                [layers.pop("w_gate"), layers.pop("w_up")], axis=-1)
        return {**params, "layers": layers}

    # ----------------------------------------------------------------- forward
    @property
    def _base_forward(self) -> bool:
        """True when this instance runs the base scan machinery (no
        apply/_scan_stack override); gates the carry-cache and window-decode
        fast paths."""
        cls = type(self)
        return (cls.apply is LlamaForCausalLM.apply
                and cls._scan_stack is LlamaForCausalLM._scan_stack)

    @property
    def supports_staged_kv_write(self) -> bool:
        """True when the layer body routes KV writes through the staged
        page-granular path (write_kv_staged) when the runner supplies
        stage arrays. Base scan machinery only (pipeline drains use masked
        per-token flushes)."""
        return self._base_forward

    @property
    def _window_forward_ok(self) -> bool:
        """Hook: can this model's forward take the window (frozen cache +
        tail) form? Base requirement: the base scan machinery. MoE/MLA
        subclasses override after implementing their window branches."""
        return self._base_forward

    @property
    def supports_window_decode(self) -> bool:
        """True when the multi-step runner may use the frozen-cache + tail
        window path (ops/window_decode_attention.py)."""
        return self._window_forward_ok and self.pp_size == 1

    def _cos_sin(self, md):
        """Rotary cos/sin for this step's tokens (hook: Qwen2-VL overrides
        with the 3-channel mrope computation)."""
        return compute_cos_sin(md.token_pos, self._inv_freq,
                               self._rope_mscale, self._longrope_orig_max)

    def apply(self, params: dict, input_ids: jax.Array, kv_cache: jax.Array,
              md: AttentionMetadata, *, use_pallas: bool = False,
              lora: dict | None = None, mm=None
              ) -> tuple[jax.Array, jax.Array]:
        if lora is not None:
            # Boundary adapters ([S, ...], no layer dim) must not enter the
            # layer scan; split them off (lora/models.py embed/lm_head).
            lora = dict(lora)
            lora_extra = {k: lora.pop(k) for k in list(lora)
                          if k.endswith(("_embed", "_lm_head"))}
        else:
            lora_extra = {}
        x = jnp.take(params["embed"], input_ids, axis=0)
        if "lora_A_embed" in lora_extra and md.lora_slots is not None:
            from aphrodite_tpu.lora.models import lora_embed_delta
            x = x + lora_embed_delta(
                input_ids, md.lora_slots, lora_extra["lora_A_embed"],
                lora_extra["lora_B_embed"]).astype(x.dtype)
        if mm is not None:
            # Multimodal merge: projected image embeddings overwrite the
            # placeholder-token rows (scatter; pad rows carry index==T and
            # drop). Reference: masked_scatter in llava.py, redesigned as
            # an in-graph scatter so chunked prefill composes naturally.
            mm_embeds, mm_idx = mm
            x = x.at[mm_idx].set(mm_embeds.astype(x.dtype), mode="drop")
        cos, sin = self._cos_sin(md)
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        scan_layers = (params["layers"] if lora is None
                       else {**params["layers"], **lora})

        def qkv_proj(x, lp, lin, cs=None):
            """Shared attention-block projections: norms, QKV, rope.
            cs overrides the step-wide rope tables (pipeline microbatches
            carry their own sliced cos/sin)."""
            c_rope, s_rope = cs if cs is not None else (cos, sin)
            h = rms_norm(x, lp["input_norm"], self.rms_eps)
            if "w_qkv" in lp:
                # Fused QKV GEMM (maybe_merge_params): one weight stream.
                qkv = lin(h, "w_qkv", lp.get("b_qkv"))
                o1, o2 = nq * hd, (nq + nkv) * hd
                q, k, v = qkv[:, :o1], qkv[:, o1:o2], qkv[:, o2:]
            else:
                q = lin(h, "wq", lp.get("bq"))
                k = lin(h, "wk", lp.get("bk"))
                v = lin(h, "wv", lp.get("bv"))
            T = q.shape[0]
            if "q_norm_flat" in lp:  # whole-projection QK-norm (OLMoE)
                q = rms_norm(q, lp["q_norm_flat"], self.rms_eps)
                k = rms_norm(k, lp["k_norm_flat"], self.rms_eps)
            q = q.reshape(T, nq, hd)
            k = k.reshape(T, nkv, hd)
            if "q_norm" in lp:  # per-head QK-norm (Qwen3 family)
                q = rms_norm(q, lp["q_norm"], self.rms_eps)
                k = rms_norm(k, lp["k_norm"], self.rms_eps)
            if "q_ln_w" in lp:  # per-head distinct LayerNorm (Chameleon)
                def phln(v, w, b):
                    vf = v.astype(jnp.float32)
                    mu = jnp.mean(vf, -1, keepdims=True)
                    var = jnp.var(vf, -1, keepdims=True)
                    return ((vf - mu) * jax.lax.rsqrt(var + 1e-5) * w + b
                            ).astype(v.dtype)
                q = phln(q, lp["q_ln_w"], lp["q_ln_b"])
                k = phln(k, lp["k_ln_w"], lp["k_ln_b"])
            q = apply_rope(q, c_rope, s_rope)
            k = apply_rope(k, c_rope, s_rope)
            v = v.reshape(T, nkv, hd)
            if "kv_k_scale" in lp:
                # Calibrated fp8-KV scales: the cache stores k/ks and v/vs;
                # q·k is bilinear so q absorbs ks BEFORE the kernel, and
                # the attention output absorbs vs in finish_layer — the
                # Pallas kernels never see a scale (reference applies them
                # inside paged_attention, quantization/kv_cache.py).
                q = q * lp["kv_k_scale"].astype(q.dtype)
                k = k / lp["kv_k_scale"].astype(k.dtype)
                v = v / lp["kv_v_scale"].astype(v.dtype)
            return q, k, v

        def make_lin(lp):
            def lin(h, key, bias=None):
                y = apply_linear(h, lp[key], bias, fmt=self.quant_fmt)
                A = lp.get("lora_A_" + key)
                if A is not None:
                    from aphrodite_tpu.lora.models import lora_apply
                    y = y + lora_apply(h, A, lp["lora_B_" + key],
                                       md.lora_slots)
                return y
            return lin

        def finish_layer(x, o, lp, lin):
            T = o.shape[0]
            if "kv_v_scale" in lp:
                o = o * lp["kv_v_scale"].astype(o.dtype)
            x = self._sp(x + lin(o.reshape(T, nq * hd), "wo"))
            h = rms_norm(x, lp["post_norm"], self.rms_eps)
            return self._sp(x + self._mlp(h, lp, lin=lin))

        if isinstance(kv_cache, tuple):
            # Multi-step window decode (worker/runner.py): the paged cache
            # is frozen; per-layer K/V tails ride the scan carry and are
            # updated in place (ops/window_decode_attention.py rationale).
            from aphrodite_tpu.attention.backend import (window_attention,
                                                         write_tail)
            cache, tail_k, tail_v = kv_cache

            def layer_w(carry, xs):
                x, tk, tv = carry
                lp, l = xs
                lin = make_lin(lp)
                q, k, v = qkv_proj(x, lp, lin)
                tk = write_tail(tk, k, l, md.window_step)
                tv = write_tail(tv, v, l, md.window_step)
                o = window_attention(q, cache, tk, tv, l, md, self.scale,
                                     sliding_window=self.sliding_window,
                                     use_pallas=use_pallas)
                return (x := finish_layer(x, o, lp, lin), tk, tv), None

            x, tail_k, tail_v = self._scan_stack_window(
                layer_w, (x, tail_k, tail_v), scan_layers, params)
            x = rms_norm(x, params["final_norm"], self.rms_eps)
            return x, (cache, tail_k, tail_v)

        # NOTE: a carry-cache variant (full cache in the scan carry with
        # in-place layer-indexed scatters + kernel-aliased pass-through) was
        # benchmarked at +150 ms/dispatch: XLA copy-insertion materializes
        # the whole cache around the custom call when a scatter feeds it
        # inside a while body. The xs/ys dataflow below costs one cache
        # copy per dispatch (~30 ms at 8k tokens) and stays until KV writes
        # move into the kernel (page-aligned staging design).
        def layer(x, xs, slots=None, ctx=None):
            lp, kvc = xs
            md_l, cs = (md, None) if ctx is None else \
                (ctx[0], (ctx[1], ctx[2]))
            if slots is None:
                slots = md_l.slot_mapping
            lin = make_lin(lp)
            q, k, v = qkv_proj(x, lp, lin, cs=cs)
            if ctx is None and md_l.stage_pages is not None:
                # Page-granular staged write (~25x faster than the
                # per-token XLA scatter at prefill T; see write_kv_staged).
                from aphrodite_tpu.attention.backend import write_kv_staged
                kvc = write_kv_staged(kvc, k, v, md_l.stage_pages,
                                      md_l.stage_src)
            else:
                kvc = write_kv(kvc, k, v, slots)
            o = paged_attention(
                q, kvc, md_l, self.scale,
                sliding_window=self.sliding_window,
                use_pallas=use_pallas and (ctx is None
                                           or md_l.item_req is not None))
            x = finish_layer(x, o, lp, lin)
            return x, kvc

        if self.pp_size > 1:
            x, new_cache = self._pipeline(layer, x, scan_layers, kv_cache,
                                          md)
        else:
            x, new_cache = self._scan_stack(layer, x, scan_layers, kv_cache,
                                            params)
        x = rms_norm(x, params["final_norm"], self.rms_eps)
        return x, new_cache

    def _scan_stack(self, layer, x, scan_layers, kv_cache, params):
        """Scan the layer body over the stacked weights. Hook: models with
        heterogeneous per-layer parameter stacks (mixed dense/MoE) override
        this with a run-segmented scan (see mixtral.py)."""
        return jax.lax.scan(layer, x, (scan_layers, kv_cache))

    def _scan_stack_window(self, layer_w, carry, scan_layers, params):
        """Window-decode layer scan (carry = (x, tail_k, tail_v)); same
        heterogeneous-stack hook as _scan_stack (tails are full [L, ...]
        buffers indexed by the layer id, so segmented overrides thread the
        whole carry through every run)."""
        carry, _ = jax.lax.scan(layer_w, carry,
                                (scan_layers, jnp.arange(self.num_layers)))
        return carry

    # Microbatches per pipeline step (GPipe-style; bubble fraction is
    # (pp-1)/(M+pp-1), so more microbatches amortize it better as long as
    # T/M stays MXU-worthy).
    pp_microbatches: int = 4

    def _pipeline(self, layer, x, scan_layers, kv_cache, md):
        """Microbatched pipeline parallelism over the `pp` mesh axis
        (reference: _PP group + virtual engines,
        aphrodite/distributed/parallel_state.py:809; redesigned for SPMD).
        The [L, ...] layer stack and KV cache are sharded on L across pp
        stages. The token batch splits into M microbatches; at schedule
        step s, stage k runs its LOCAL layers on microbatch s-k and
        ppermutes the hidden to stage k+1 — stages overlap on different
        microbatches, so per-device compute is ~(M+pp-1)/(M*pp) of the
        full model instead of 1x (the round-1 design recomputed every
        stage everywhere: pp-times waste). Bubble iterations run on zeros
        with KV writes masked (slot=-1); the finished microbatches are
        harvested from the last stage with a masked psum broadcast (f32:
        bf16 all-reduce inside a partial-manual shard_map crashes XLA:CPU's
        partitioner). Attention inside the pipeline takes the Pallas kernel when the
        runner supplies per-microbatch work items
        (build_pp_work_items): relative qstarts stay 8-aligned because
        Tm is a multiple of 128, bubble iterations run with a zero item
        count, and causal masking covers the not-yet-written KV of later
        microbatches.

        Causality across microbatches holds because every stage processes
        microbatches in order: tokens in microbatch m+1 attend to KV that
        the same stage wrote for microbatch m one schedule step earlier."""
        import dataclasses

        import jax.lax as lax
        from jax.sharding import PartitionSpec as P
        pp = self.pp_size
        mesh = self.mesh
        assert mesh is not None and "pp" in mesh.axis_names
        T = x.shape[0]
        M = min(self.pp_microbatches, T)
        while T % M:
            M -= 1
        Tm = T // M
        nsteps = M + pp - 1

        tok_fields = {"token_req_idx": md.token_req_idx,
                      "token_pos": md.token_pos,
                      "slot_mapping": md.slot_mapping}
        if md.lora_slots is not None:
            tok_fields["lora_slots"] = md.lora_slots
        mrope = md.mrope_pos  # [3, T] or None

        def pipeline(scan_layers, kv_cache, x, tok, mrope_pos):
            stage = lax.axis_index("pp")
            x = lax.pcast(x, "pp", to="varying")
            tok = {k: lax.pcast(v, "pp", to="varying")
                   for k, v in tok.items()}
            if mrope_pos is not None:
                mrope_pos = lax.pcast(mrope_pos, "pp", to="varying")
            H = x.shape[-1]
            buf0 = lax.pcast(jnp.zeros((Tm, H), x.dtype), "pp",
                             to="varying")
            outs0 = lax.pcast(jnp.zeros((M, Tm, H), x.dtype), "pp",
                              to="varying")

            def step(carry, s):
                buf, outs, kv = carry
                mb = s - stage
                active = (mb >= 0) & (mb < M)
                mbc = jnp.clip(mb, 0, M - 1)
                start = mbc * Tm
                inp = jnp.where(stage == 0,
                                lax.dynamic_slice_in_dim(x, start, Tm), buf)
                sl = {k: lax.dynamic_slice_in_dim(v, start, Tm)
                      for k, v in tok.items()}
                slots = jnp.where(active, sl["slot_mapping"], -1)
                repl = dict(token_req_idx=sl["token_req_idx"],
                            token_pos=sl["token_pos"],
                            slot_mapping=slots,
                            num_tokens=jnp.minimum(md.num_tokens, Tm))
                if "lora_slots" in sl:
                    repl["lora_slots"] = sl["lora_slots"]
                if mrope_pos is not None:
                    repl["mrope_pos"] = lax.dynamic_slice_in_dim(
                        mrope_pos, start, Tm, axis=1)
                if md.pp_item_req is not None:
                    # Per-microbatch Pallas work items (runner
                    # build_pp_work_items): slice the active row; gate
                    # the item count by `active` so bubble iterations
                    # skip every grid step.
                    nitems = jnp.where(active, md.pp_num_items[mbc],
                                       0)
                    repl.update(
                        item_req=md.pp_item_req[mbc],
                        item_qstart=md.pp_item_qstart[mbc],
                        item_qlen=md.pp_item_qlen[mbc],
                        item_pos=md.pp_item_pos[mbc],
                        num_items_arr=nitems,
                        token_item=md.pp_token_item[mbc],
                        token_item_row=md.pp_token_item_row[mbc])
                md_mb = dataclasses.replace(md, **repl)
                cos_mb, sin_mb = self._cos_sin(md_mb)

                def body(xx, xs):
                    return layer(xx, xs, slots=slots,
                                 ctx=(md_mb, cos_mb, sin_mb))

                y, kv = jax.lax.scan(body, inp, (scan_layers, kv))
                upd = lax.dynamic_update_index_in_dim(outs, y, mbc, 0)
                outs = jnp.where((stage == pp - 1) & active, upd, outs)
                buf = lax.ppermute(
                    y, "pp", [(i, (i + 1) % pp) for i in range(pp)])
                return (buf, outs, kv), None

            (_, outs, kv_cache), _ = lax.scan(
                step, (buf0, outs0, kv_cache),
                jnp.arange(nsteps, dtype=jnp.int32))
            out = lax.psum(
                jnp.where(stage == pp - 1, outs, 0).astype(jnp.float32),
                "pp").astype(x.dtype)
            return out.reshape(T, H), kv_cache

        layers_specs = jax.tree.map(lambda _: P("pp"), scan_layers)
        tok_specs = {k: P() for k in tok_fields}
        return jax.shard_map(
            pipeline, mesh=mesh,
            in_specs=(layers_specs, P("pp"), P(), tok_specs,
                      P() if mrope is not None else None),
            out_specs=(P(), P("pp")),
            # Pallas calls inside the region produce ShapeDtypeStructs
            # without vma annotations; skip the varying-mesh-axes check.
            check_vma=False,
            axis_names={"pp"})(scan_layers, kv_cache, x, tok_fields, mrope)

    def _sp(self, x: jax.Array) -> jax.Array:
        """Token-dim activation sharding constraint (no-op on 1-device
        meshes). The token axis shards over ``dp`` (data parallelism: each
        replica computes its share of the batch's rows through every GEMM —
        weights stay replicated) and, with sequence_parallel, additionally
        over ``tp`` (XLA reduce-scatters the TP matmul outputs and runs
        norms/elementwise token-sharded). Skipped inside the pp shard_map
        region: constraints on pp-varying arrays are rejected there, and
        the pipeline already communicates explicitly."""
        if self.mesh is None:
            return x
        sizes = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
        axes = []
        if sizes.get("dp", 1) > 1:
            axes.append("dp")
        if self.sequence_parallel and sizes.get("tp", 1) > 1:
            axes.append("tp")
        if not axes:
            return x
        try:
            am = jax.sharding.get_abstract_mesh()
            if "pp" in getattr(am, "manual_axes", ()):
                return x
        except Exception:
            pass
        from jax.sharding import NamedSharding
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, P(tuple(axes), None)))
        return x

    def _mlp(self, h: jax.Array, lp: dict, lin=None) -> jax.Array:
        if lin is None:
            fmt = self.quant_fmt
            lin = lambda hh, key, bias=None: apply_linear(  # noqa: E731
                hh, lp[key], bias, fmt=fmt)
        if "w_gate_up" in lp:  # fused gate|up GEMM (maybe_merge_params)
            gu = lin(h, "w_gate_up")
            I = gu.shape[-1] // 2
            gate, up = gu[:, :I], gu[:, I:]
        else:
            gate = lin(h, "w_gate")
            up = lin(h, "w_up")
        return lin(self.act(gate, up), "w_down")

    # set by quantization.loader when lm_head_quantized
    lm_head_quant_fmt = None

    def compute_logits(self, params: dict, hidden: jax.Array) -> jax.Array:
        head = params["embed"].T if self.tie_embeddings else params["lm_head"]
        if isinstance(head, dict):
            # keep the f32 accumulator (apply_linear would round logits
            # through bf16); XLA fuses the int8 upcast into the dot
            acc = jnp.dot(hidden, head["qweight"].astype(hidden.dtype),
                          preferred_element_type=jnp.float32)
            return acc * head["scales"].astype(jnp.float32)[None, :]
        return jnp.dot(hidden, head, preferred_element_type=jnp.float32)


class MistralForCausalLM(LlamaForCausalLM):
    pass


class Qwen2ForCausalLM(LlamaForCausalLM):
    qkv_bias = True
    tie_embeddings_default = False


class InternLM3ForCausalLM(LlamaForCausalLM):
    """InternLM3 (remote-code config): llama body; bias flag is spelled
    `qkv_bias` and applies to q/k/v only."""

    def __init__(self, config):
        super().__init__(config)
        hf = config.text_config
        self.qkv_bias = getattr(hf, "qkv_bias", False)
