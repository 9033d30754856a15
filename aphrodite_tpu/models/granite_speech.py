"""Granite Speech: conformer CTC encoder + Blip2-QFormer window projector
over the Granite decoder.

Parity: aphrodite/modeling/models/granite_speech.py. Mechanisms:
- conformer blocks (granite_speech.py:250-447): half-step feedforwards
  (0.5x residual), block-local attention over ``context_size`` windows
  with Shaw relative-position biases (q . E[clamp(rel_dist)]), a
  remainder-block mask, and a conv module (pointwise GLU up, depthwise
  conv with near-symmetric padding, eval-mode BatchNorm running stats,
  SiLU, pointwise down);
- a mid-stack CTC branch at layer num_layers//2: out -> softmax ->
  out_mid added back (granite_speech.py:497-510);
- projector (granite_speech.py:193-244): split frames into
  ``window_size`` blocks, run the shared Blip2 QFormer with
  ``window/downsample`` learned queries per block, linear to text hidden;
- the first ``audio_embed_sizes`` projected rows scatter onto the
  prompt's audio placeholder tokens.
"""
from __future__ import annotations

from functools import partial
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.blip2 import Blip2QFormer
from aphrodite_tpu.models.llama_variants import GraniteForCausalLM
from aphrodite_tpu.models.vision import layer_norm


class GraniteConformerEncoder:
    """CTC conformer over mel features [B, T, input_dim] (static T)."""

    def __init__(self, ec, dtype) -> None:
        self.dtype = dtype
        self.input_dim = ec.input_dim
        self.hidden = ec.hidden_dim
        self.depth = ec.num_layers
        self.ff_mult = ec.feedforward_mult
        self.heads = ec.num_heads
        self.head_dim = ec.dim_head
        self.inner = self.heads * self.head_dim
        self.out_dim = ec.output_dim
        self.ctx = ec.context_size
        self.max_pos = ec.max_pos_emb
        self.kernel = ec.conv_kernel_size
        self.conv_inner = self.hidden * ec.conv_expansion_factor
        self.scale = self.head_dim ** -0.5
        # Shaw distances (granite_speech.py:457-462).
        seq = np.arange(self.ctx)
        self.dists = np.clip(seq[:, None] - seq[None, :], -self.ctx,
                             self.ctx) + self.max_pos

    def shapes(self) -> dict:
        D, L, F = self.hidden, self.depth, self.hidden * self.ff_mult
        ci, inner = self.conv_inner, self.inner
        layers = {
            "attn_norm_w": (L, D), "attn_norm_b": (L, D),
            "to_q": (L, D, inner), "to_kv": (L, D, 2 * inner),
            "to_out": (L, inner, D), "to_out_b": (L, D),
            "rel_pos": (L, 2 * self.max_pos + 1, self.head_dim),
            "conv_norm_w": (L, D), "conv_norm_b": (L, D),
            "conv_up": (L, D, 2 * ci), "conv_up_b": (L, 2 * ci),
            "depth_w": (L, ci, self.kernel),
            "bn_w": (L, ci), "bn_b": (L, ci),
            "bn_mean": (L, ci), "bn_var": (L, ci),
            "conv_down": (L, ci, D), "conv_down_b": (L, D),
            "post_norm_w": (L, D), "post_norm_b": (L, D),
        }
        for ff in ("ff1", "ff2"):
            layers.update({
                f"{ff}_norm_w": (L, D), f"{ff}_norm_b": (L, D),
                f"{ff}_up": (L, D, F), f"{ff}_up_b": (L, F),
                f"{ff}_down": (L, F, D), f"{ff}_down_b": (L, D)})
        return {
            "input_w": (self.input_dim, D), "input_b": (D,),
            "out_w": (D, self.out_dim), "out_b": (self.out_dim,),
            "out_mid_w": (self.out_dim, D), "out_mid_b": (D,),
            "layers": layers,
        }

    def make_bufs(self, target) -> dict:
        def mk(shapes):
            return {k: mk(v) if isinstance(v, dict) else np.zeros(v, target)
                    for k, v in shapes.items()}
        bufs = mk(self.shapes())
        bufs["layers"]["bn_var"][...] = 1.0
        return bufs

    def init_dummy(self, rng: jax.Array) -> dict:
        keys = iter(jax.random.split(rng, 64))

        def fill(shapes):
            out = {}
            for k, s in shapes.items():
                if isinstance(s, dict):
                    out[k] = fill(s)
                elif "norm_w" in k or k == "bn_w" or k == "bn_var":
                    out[k] = jnp.ones(s, self.dtype)
                elif k.endswith("_b") or k in ("bn_mean",):
                    out[k] = jnp.zeros(s, self.dtype)
                else:
                    out[k] = (0.02 * jax.random.normal(
                        next(keys), s, jnp.float32)).astype(self.dtype)
            return out
        return fill(self.shapes())

    _MAP = {
        "ff1.pre_norm.weight": ("ff1_norm_w", 0),
        "ff1.pre_norm.bias": ("ff1_norm_b", 0),
        "ff1.up_proj.weight": ("ff1_up", 1),
        "ff1.up_proj.bias": ("ff1_up_b", 0),
        "ff1.down_proj.weight": ("ff1_down", 1),
        "ff1.down_proj.bias": ("ff1_down_b", 0),
        "ff2.pre_norm.weight": ("ff2_norm_w", 0),
        "ff2.pre_norm.bias": ("ff2_norm_b", 0),
        "ff2.up_proj.weight": ("ff2_up", 1),
        "ff2.up_proj.bias": ("ff2_up_b", 0),
        "ff2.down_proj.weight": ("ff2_down", 1),
        "ff2.down_proj.bias": ("ff2_down_b", 0),
        "attn.pre_norm.weight": ("attn_norm_w", 0),
        "attn.pre_norm.bias": ("attn_norm_b", 0),
        "attn.to_q.weight": ("to_q", 1),
        "attn.to_kv.weight": ("to_kv", 1),
        "attn.to_out.weight": ("to_out", 1),
        "attn.to_out.bias": ("to_out_b", 0),
        "attn.rel_pos_emb.weight": ("rel_pos", 0),
        "conv.norm.weight": ("conv_norm_w", 0),
        "conv.norm.bias": ("conv_norm_b", 0),
        "conv.up_conv.weight": ("conv_up", 2),     # [2ci, D, 1]
        "conv.up_conv.bias": ("conv_up_b", 0),
        "conv.depth_conv.conv.weight": ("depth_w", 3),  # [ci, 1, k]
        "conv.batch_norm.weight": ("bn_w", 0),
        "conv.batch_norm.bias": ("bn_b", 0),
        "conv.batch_norm.running_mean": ("bn_mean", 0),
        "conv.batch_norm.running_var": ("bn_var", 0),
        "conv.down_conv.weight": ("conv_down", 2),  # [D, ci, 1]
        "conv.down_conv.bias": ("conv_down_b", 0),
        "post_norm.weight": ("post_norm_w", 0),
        "post_norm.bias": ("post_norm_b", 0),
    }

    def load_hf(self, name: str, w: np.ndarray, bufs: dict, target) -> bool:
        """Consume an ``encoder.``-stripped tensor name."""
        top = {"input_linear.weight": ("input_w", True),
               "input_linear.bias": ("input_b", False),
               "out.weight": ("out_w", True),
               "out.bias": ("out_b", False),
               "out_mid.weight": ("out_mid_w", True),
               "out_mid.bias": ("out_mid_b", False)}
        m = top.get(name)
        if m is not None:
            key, tr = m
            bufs[key][...] = (w.T if tr else w).astype(target)
            return True
        if not name.startswith("layers."):
            return False
        _, li, rest = name.split(".", 2)
        if rest.endswith("num_batches_tracked"):
            return True
        m = self._MAP.get(rest)
        if m is None:
            return False
        key, mode = m
        if mode == 1:
            w = w.T
        elif mode == 2:       # pointwise Conv1d [out, in, 1] -> [in, out]
            w = w[:, :, 0].T
        elif mode == 3:       # depthwise Conv1d [ci, 1, k] -> [ci, k]
            w = w[:, 0, :]
        bufs["layers"][key][int(li)] = w.astype(target)
        return True

    def _ff(self, x, lp, pre):
        h = layer_norm(x, lp[f"{pre}_norm_w"], lp[f"{pre}_norm_b"], 1e-5)
        h = jax.nn.silu(jnp.dot(h, lp[f"{pre}_up"]) + lp[f"{pre}_up_b"])
        return jnp.dot(h, lp[f"{pre}_down"]) + lp[f"{pre}_down_b"]

    def _attn(self, x, lp):
        B, T, D = x.shape
        nh, hd, ctx = self.heads, self.head_dim, self.ctx
        h = layer_norm(x, lp["attn_norm_w"], lp["attn_norm_b"], 1e-5)
        nb = -(-T // ctx)
        rem = T % ctx
        if rem:
            h = jnp.pad(h, ((0, 0), (0, ctx - rem), (0, 0)))
        q = jnp.dot(h, lp["to_q"]).reshape(B, nb, ctx, nh, hd)
        kv = jnp.dot(h, lp["to_kv"])
        k, v = jnp.split(kv, 2, axis=-1)
        k = k.reshape(B, nb, ctx, nh, hd)
        v = v.reshape(B, nb, ctx, nh, hd)
        # Shaw bias: q . rel_pos_emb[dist] (granite_speech.py:333-340)
        rel = lp["rel_pos"][jnp.asarray(self.dists)]  # [ctx, ctx, hd]
        s = jnp.einsum("bnchd,bnkhd->bnhck", q, k,
                       preferred_element_type=jnp.float32)
        bias = jnp.einsum("bnchd,ckd->bnhck", q.astype(jnp.float32),
                          rel.astype(jnp.float32))
        s = (s + bias) * self.scale
        if rem:
            pad_mask = np.ones((ctx, ctx), bool)
            pad_mask[:rem, :rem] = False
            big = np.float32(np.finfo(np.float32).max)
            s = s.at[:, -1].add(jnp.asarray(pad_mask, jnp.float32)[None]
                                * -big)
        a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        o = jnp.einsum("bnhck,bnkhd->bnchd", a, v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        o = o.reshape(B, nb * ctx, nh * hd)[:, :T]
        return jnp.dot(o, lp["to_out"]) + lp["to_out_b"]

    def _conv(self, x, lp):
        h = layer_norm(x, lp["conv_norm_w"], lp["conv_norm_b"], 1e-5)
        h = jnp.dot(h, lp["conv_up"]) + lp["conv_up_b"]  # pointwise up
        a, g = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(g)                        # GLU over channels
        # Depthwise conv along time with (pad, pad - offset) padding.
        pad = self.kernel // 2
        pad_r = pad - (self.kernel + 1) % 2
        h = jnp.pad(h, ((0, 0), (pad, pad_r), (0, 0)))
        h = jax.lax.conv_general_dilated(
            h.astype(jnp.float32),
            lp["depth_w"].astype(jnp.float32).T[:, None, :],  # [k,1,ci]
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.conv_inner).astype(x.dtype)
        # Eval-mode BatchNorm with running statistics.
        h = (h - lp["bn_mean"]) * jax.lax.rsqrt(
            lp["bn_var"].astype(jnp.float32) + 1e-5) * lp["bn_w"] \
            + lp["bn_b"]
        h = jax.nn.silu(h.astype(x.dtype))
        return jnp.dot(h, lp["conv_down"]) + lp["conv_down_b"]

    def encode(self, ep: dict, feats: jax.Array) -> jax.Array:
        """[B, T, input_dim] -> [B, T, hidden]."""
        x = jnp.dot(feats.astype(self.dtype), ep["input_w"]) + ep["input_b"]
        lp_all = ep["layers"]
        for i in range(self.depth):
            lp = {k: v[i] for k, v in lp_all.items()}
            x = x + 0.5 * self._ff(x, lp, "ff1")
            x = x + self._attn(x, lp)
            x = x + self._conv(x, lp)
            x = x + 0.5 * self._ff(x, lp, "ff2")
            x = layer_norm(x, lp["post_norm_w"], lp["post_norm_b"], 1e-5)
            if i + 1 == self.depth // 2:
                mid = jax.nn.softmax(
                    jnp.dot(x, ep["out_w"]).astype(jnp.float32)
                    + ep["out_b"].astype(jnp.float32), axis=-1
                ).astype(x.dtype)
                x = x + (jnp.dot(mid, ep["out_mid_w"]) + ep["out_mid_b"])
        return x


class GraniteSpeechForConditionalGeneration(GraniteForCausalLM):
    """Reference granite_speech.py:513 — Granite decoder + conformer CTC
    encoder + windowed Blip2-QFormer projector."""

    is_multimodal = True
    mm_needs_extra = True

    def __init__(self, config):
        super().__init__(config)
        hf = config.hf_config
        self.encoder = GraniteConformerEncoder(hf.encoder_config, self.dtype)
        pc = hf.projector_config
        self.qformer = Blip2QFormer(pc, self.encoder.hidden, self.dtype)
        self.window = hf.window_size
        self.num_queries = hf.window_size // hf.downsample_rate
        self.proj_hidden = pc.hidden_size
        self.audio_token_id = getattr(hf, "audio_token_index", None)
        self._enc_cache: dict = {}

    def _proj_shapes(self) -> dict:
        return {"query": (1, self.num_queries, self.proj_hidden),
                "linear_w": (self.proj_hidden, self.hidden_size),
                "linear_b": (self.hidden_size,)}

    def init_dummy_params(self, rng):
        params = super().init_dummy_params(rng)
        params["encoder"] = self.encoder.init_dummy(
            jax.random.fold_in(rng, 41))
        params["qformer"] = jax.tree.map(
            jnp.asarray, self.qformer.make_bufs(
                np.dtype(jnp.dtype(self.dtype).name)
                if self.dtype != jnp.bfloat16 else np.dtype("bfloat16")))
        keys = iter(jax.random.split(jax.random.fold_in(rng, 42), 4))
        params["projector"] = {
            k: (jnp.zeros(s, self.dtype) if k.endswith("_b") else
                (0.02 * jax.random.normal(next(keys), s, jnp.float32)
                 ).astype(self.dtype))
            for k, s in self._proj_shapes().items()}
        return params

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        enc_bufs = self.encoder.make_bufs(target)
        q_bufs = self.qformer.make_bufs(target)
        proj = {k: np.zeros(s, target)
                for k, s in self._proj_shapes().items()}

        def route(ws):
            for name, w in ws:
                w = np.asarray(w)
                if name.startswith("encoder."):
                    self.encoder.load_hf(name[len("encoder."):], w,
                                         enc_bufs, target)
                elif name.startswith("projector.qformer."):
                    self.qformer.load_hf(name[len("projector.qformer."):],
                                         w, q_bufs, target)
                elif name == "projector.query":
                    proj["query"][...] = w.astype(target)
                elif name == "projector.linear.weight":
                    proj["linear_w"][...] = w.T.astype(target)
                elif name == "projector.linear.bias":
                    proj["linear_b"][...] = w.astype(target)
                elif name.startswith("language_model."):
                    yield name[len("language_model."):], w
                else:
                    yield name, w

        params = super().load_weights(route(weights))
        params["encoder"] = enc_bufs
        params["qformer"] = q_bufs
        params["projector"] = proj
        return params

    def param_specs(self):
        specs = super().param_specs()
        for sub, mod in (("encoder", self.encoder),
                         ("qformer", self.qformer)):
            specs[sub] = jax.tree.map(lambda _: P(), mod.shapes(),
                                      is_leaf=lambda x: isinstance(x, tuple))
        specs["projector"] = {k: P() for k in self._proj_shapes()}
        return specs

    # ---------------------------------------------------------------- encode
    def _encode(self, params, feats, n_rows):
        enc = self.encoder.encode(params["encoder"], feats)  # [1, T, D]
        B, T, D = enc.shape
        nb = -(-T // self.window)
        if nb * self.window != T:
            enc = jnp.pad(enc, ((0, 0), (0, nb * self.window - T), (0, 0)))
        blocks = enc.reshape(B * nb, self.window, D)
        queries = jnp.broadcast_to(
            params["projector"]["query"],
            (B * nb, self.num_queries, self.proj_hidden)).astype(self.dtype)
        out = self.qformer.run(params["qformer"], queries, blocks)
        out = out.reshape(B, nb * self.num_queries, -1)
        out = jnp.dot(out, params["projector"]["linear_w"]) \
            + params["projector"]["linear_b"]
        return out[0, :n_rows]

    def encode_media(self, params, pixel_values, audio_embed_sizes=None):
        """pixel_values: mel features [1, T, input_dim] (one audio per
        request, reference granite_speech.py:74); the first
        audio_embed_sizes rows scatter onto the placeholder tokens."""
        feats = pixel_values
        if feats.ndim == 2:
            feats = feats[None]
        T = int(feats.shape[1])
        nb = -(-T // self.window)
        n_rows = int(audio_embed_sizes[0]) if audio_embed_sizes is not None \
            else nb * self.num_queries
        key = (feats.shape, n_rows)
        fn = self._enc_cache.get(key)
        if fn is None:
            fn = jax.jit(partial(self._encode, n_rows=n_rows))
            self._enc_cache[key] = fn
        return fn(params, jnp.asarray(feats))
