"""Audio-language models: Qwen2-Audio (+ the shared Whisper-style audio
encoder tower).

Parity: aphrodite/modeling/models/qwen2_audio.py. The audio tower is the
Whisper encoder (conv1 -> conv2/2 -> pos -> layers) followed by a
kernel-2 average pool and LayerNorm (HF Qwen2AudioEncoder), then a linear
projector into the text width. Per-item real feature lengths mask encoder
self-attention (shorter audio is zero-padded to the 30 s mel chunk), and
each audio's projected rows land on its placeholder span via the standard
multimodal scatter.
"""
from __future__ import annotations

from functools import partial
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.llama import Qwen2ForCausalLM
from aphrodite_tpu.models.vision import layer_norm


def audio_output_lengths(mel_len: int) -> int:
    """HF Qwen2Audio._get_feat_extract_output_lengths: conv2 (stride 2)
    then the kernel-2 avg pool."""
    conv_out = (mel_len - 1) // 2 + 1
    return (conv_out - 2) // 2 + 1


class AudioEncoderTower:
    """Whisper-encoder geometry + Qwen2-Audio's pool/norm tail."""

    def __init__(self, ac, dtype) -> None:
        self.ac = ac
        self.dtype = dtype
        self.d_model = ac.d_model
        self.layers = ac.encoder_layers
        self.heads = ac.encoder_attention_heads
        self.ffn = ac.encoder_ffn_dim
        self.n_mels = ac.num_mel_bins
        self.max_source = ac.max_source_positions

    def _shapes(self) -> dict:
        D, F, L = self.d_model, self.ffn, self.layers
        shapes = {"conv1_w": (D, self.n_mels, 3), "conv1_b": (D,),
                  "conv2_w": (D, D, 3), "conv2_b": (D,),
                  "pos": (self.max_source, D),
                  "ln_w": (D,), "ln_b": (D,)}
        per = {"ln1_w": (D,), "ln1_b": (D,), "wq": (D, D), "bq": (D,),
               "wk": (D, D), "wv": (D, D), "bv": (D,), "wo": (D, D),
               "bo": (D,), "fln_w": (D,), "fln_b": (D,),
               "fc1_w": (D, F), "fc1_b": (F,), "fc2_w": (F, D),
               "fc2_b": (D,)}
        shapes["layers"] = {k: (L,) + s for k, s in per.items()}
        return shapes

    def make_bufs(self, target) -> dict:
        out = {}
        for k, s in self._shapes().items():
            if k == "layers":
                out[k] = {k2: np.zeros(s2, target) for k2, s2 in s.items()}
            else:
                out[k] = np.zeros(s, target)
        return out

    def init_dummy(self, rng) -> dict:
        keys = iter(jax.random.split(rng, 64))

        def mk(s):
            return (0.02 * jax.random.normal(next(keys), s, jnp.float32)
                    ).astype(self.dtype)
        out = {}
        for k, s in self._shapes().items():
            if k == "layers":
                out[k] = {k2: (jnp.ones(s2, self.dtype)
                               if "ln" in k2 and k2.endswith("_w")
                               else jnp.zeros(s2, self.dtype)
                               if k2.endswith("_b") or "ln" in k2
                               else mk(s2)) for k2, s2 in s.items()}
            elif "ln" in k and k.endswith("_w"):
                out[k] = jnp.ones(s, self.dtype)
            elif k.endswith("_b") or ("ln" in k):
                out[k] = jnp.zeros(s, self.dtype)
            else:
                out[k] = mk(s)
        return out

    def specs(self) -> dict:
        return jax.tree.map(lambda _: P(), self._shapes(),
                            is_leaf=lambda x: isinstance(x, tuple))

    _LAYER_MAP = {
        "self_attn_layer_norm.weight": ("ln1_w", False),
        "self_attn_layer_norm.bias": ("ln1_b", False),
        "self_attn.q_proj.weight": ("wq", True),
        "self_attn.q_proj.bias": ("bq", False),
        "self_attn.k_proj.weight": ("wk", True),
        "self_attn.v_proj.weight": ("wv", True),
        "self_attn.v_proj.bias": ("bv", False),
        "self_attn.out_proj.weight": ("wo", True),
        "self_attn.out_proj.bias": ("bo", False),
        "final_layer_norm.weight": ("fln_w", False),
        "final_layer_norm.bias": ("fln_b", False),
        "fc1.weight": ("fc1_w", True), "fc1.bias": ("fc1_b", False),
        "fc2.weight": ("fc2_w", True), "fc2.bias": ("fc2_b", False),
    }
    _TOP_MAP = {
        "conv1.weight": ("conv1_w", False), "conv1.bias": ("conv1_b", False),
        "conv2.weight": ("conv2_w", False), "conv2.bias": ("conv2_b", False),
        "embed_positions.weight": ("pos", False),
        "layer_norm.weight": ("ln_w", False),
        "layer_norm.bias": ("ln_b", False),
    }

    def load(self, name: str, w: np.ndarray, bufs: dict, target) -> bool:
        top = self._TOP_MAP.get(name)
        if top is not None:
            bufs[top[0]] = w.astype(target)
            return True
        if not name.startswith("layers."):
            return False
        _, li, rest = name.split(".", 2)
        m = self._LAYER_MAP.get(rest)
        if m is None:
            return False
        key, tr = m
        bufs["layers"][key][int(li)] = (w.T if tr else w).astype(target)
        return True

    # None = no pooling (Ultravox); 2 = Qwen2-Audio's kernel-2 avg pool.
    pool: int | None = 2

    def encode(self, ep: dict, features: jax.Array, feat_lens) -> jax.Array:
        """[N, n_mels, 2*max_source] log-mel -> [N, max_source//pool, D];
        feat_lens (static tuple) masks attention for padded items."""
        x = features.astype(self.dtype)

        def conv1d(x, w, b, stride):
            out = jax.lax.conv_general_dilated(
                x, w, window_strides=(stride,), padding=((1, 1),),
                dimension_numbers=("NCH", "OIH", "NCH"))
            return out + b[None, :, None]

        x = jax.nn.gelu(conv1d(x, ep["conv1_w"], ep["conv1_b"], 1),
                        approximate=False)
        x = jax.nn.gelu(conv1d(x, ep["conv2_w"], ep["conv2_b"], 2),
                        approximate=False)
        x = jnp.transpose(x, (0, 2, 1))  # [N, S, D]
        x = x + ep["pos"][None].astype(x.dtype)
        N, S, D = x.shape
        nh, hd = self.heads, self.d_model // self.heads
        eps = 1e-5
        conv_lens = np.asarray([(fl - 1) // 2 + 1 for fl in feat_lens])
        key_mask = np.arange(S)[None, :] < conv_lens[:, None]  # [N, S]
        key_mask = jnp.asarray(key_mask)

        def layer(x, lp):
            h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], eps)
            q = (jnp.dot(h, lp["wq"]) + lp["bq"]).reshape(N, S, nh, hd)
            k = jnp.dot(h, lp["wk"]).reshape(N, S, nh, hd)
            v = (jnp.dot(h, lp["wv"]) + lp["bv"]).reshape(N, S, nh, hd)
            logits = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                                preferred_element_type=jnp.float32)
            logits = jnp.where(key_mask[:, None, None, :],
                               logits * (hd ** -0.5), -jnp.inf)
            p = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", p, v).reshape(N, S, D)
            x = x + jnp.dot(o, lp["wo"]) + lp["bo"]
            h = layer_norm(x, lp["fln_w"], lp["fln_b"], eps)
            h = jax.nn.gelu(jnp.dot(h, lp["fc1_w"]) + lp["fc1_b"],
                            approximate=False)
            x = x + jnp.dot(h, lp["fc2_w"]) + lp["fc2_b"]
            return x, None

        x, _ = jax.lax.scan(layer, x, ep["layers"])
        if self.pool:
            # kernel-2, stride-2 average pool over time, then LayerNorm
            p = self.pool
            x = x[:, : (S // p) * p].reshape(N, S // p, p, D).mean(axis=2)
        return layer_norm(x, ep["ln_w"], ep["ln_b"], eps)


class Qwen2AudioForConditionalGeneration(Qwen2ForCausalLM):
    """HF 'Qwen2AudioForConditionalGeneration' (reference
    qwen2_audio.py): Whisper-style audio tower + linear projector over a
    Qwen2 backbone."""

    is_multimodal = True
    mm_needs_extra = True

    def __init__(self, config):
        super().__init__(config)
        hf = config.hf_config
        self.audio = AudioEncoderTower(hf.audio_config, self.dtype)
        self.audio_token_id = getattr(hf, "audio_token_index", None)
        self._encode_cache: dict = {}

    def _proj_shapes(self):
        return {"w": (self.audio.d_model, self.hidden_size),
                "b": (self.hidden_size,)}

    def init_dummy_params(self, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        params = super().init_dummy_params(r1)
        params["audio"] = self.audio.init_dummy(r2)
        params["audio_proj"] = {
            "w": (0.02 * jax.random.normal(
                r3, self._proj_shapes()["w"], jnp.float32)
                ).astype(self.dtype),
            "b": jnp.zeros(self._proj_shapes()["b"], self.dtype)}
        return params

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        abufs = self.audio.make_bufs(target)
        proj = {k: np.zeros(s, target)
                for k, s in self._proj_shapes().items()}

        def route(ws):
            for name, w in ws:
                if name.startswith("model.language_model."):
                    name = "model." + name[len("model.language_model."):]
                elif name.startswith("language_model."):
                    name = name[len("language_model."):]
                elif name.startswith(("model.audio_tower.",
                                      "model.multi_modal_projector.")):
                    name = name[len("model."):]
                if name.startswith("audio_tower."):
                    self.audio.load(name[len("audio_tower."):],
                                    np.asarray(w), abufs, target)
                    continue
                if name == "multi_modal_projector.linear.weight":
                    proj["w"] = np.asarray(w).T.astype(target)
                    continue
                if name == "multi_modal_projector.linear.bias":
                    proj["b"] = np.asarray(w).astype(target)
                    continue
                yield name, w

        params = super().load_weights(route(weights))
        params["audio"] = abufs
        params["audio_proj"] = proj
        return params

    def param_specs(self):
        specs = super().param_specs()
        specs["audio"] = self.audio.specs()
        specs["audio_proj"] = {k: P() for k in self._proj_shapes()}
        return specs

    def _encode(self, params, features, feat_lens):
        enc = self.audio.encode(params["audio"], features, feat_lens)
        h = jnp.dot(enc, params["audio_proj"]["w"],
                    preferred_element_type=jnp.float32
                    ).astype(enc.dtype) + params["audio_proj"]["b"]
        # flat concat in span order: each item contributes its real
        # token count.
        pieces = [h[i, :audio_output_lengths(fl)]
                  for i, fl in enumerate(feat_lens)]
        return jnp.concatenate(pieces, axis=0) if len(pieces) > 1 \
            else pieces[0]

    def encode_images(self, params, pixel_values, feat_lens):
        """Runner entry (generic name): pixel_values [N, n_mels, frames];
        feat_lens = per-item real mel lengths."""
        key = tuple(int(x) for x in feat_lens)
        fn = self._encode_cache.get(key)
        if fn is None:
            fn = jax.jit(partial(self._encode, feat_lens=key))
            self._encode_cache[key] = fn
        return fn(params, pixel_values)

    encode_audio = encode_images


# --------------------------------------------------------------------------
# Ultravox (reference modeling/models/ultravox.py): unpooled Whisper
# encoder + frame-stacking SwiGLU projector over a llama-family backbone.
class _UltravoxMixin:
    is_multimodal = True
    mm_needs_extra = True

    def _mm_init(self, config) -> None:
        hf = config.hf_config
        self.audio = AudioEncoderTower(hf.audio_config, self.dtype)
        self.audio.pool = None
        self.stack_factor = getattr(hf, "stack_factor", 8)
        self.projector_act = getattr(hf, "projector_act", "swiglu")
        self.projector_ln_mid = getattr(hf, "projector_ln_mid", False)
        self.proj_hidden = getattr(hf, "hidden_size", 4096)
        self.audio_token_id = getattr(hf, "audio_token_index", None)
        self._encode_cache: dict = {}

    def _proj_shapes(self):
        din = self.audio.d_model * self.stack_factor
        mid = self.proj_hidden // 2 if self.projector_act == "swiglu" \
            else self.proj_hidden
        shapes = {"ln_pre": (din,),
                  "w1": (din, self.proj_hidden),
                  "w2": (mid, self.hidden_size)}
        if self.projector_ln_mid:
            shapes["ln_mid"] = (mid,)
        else:
            shapes["ln_post"] = (self.hidden_size,)
        return shapes

    def init_dummy_params(self, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        params = super().init_dummy_params(r1)
        params["audio"] = self.audio.init_dummy(r2)
        keys = iter(jax.random.split(r3, 8))
        proj = {}
        for k, s in self._proj_shapes().items():
            proj[k] = jnp.ones(s, self.dtype) if k.startswith("ln") else \
                (0.02 * jax.random.normal(next(keys), s, jnp.float32)
                 ).astype(self.dtype)
        params["audio_proj"] = proj
        return params

    def load_weights(self, weights):
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        abufs = self.audio.make_bufs(target)
        proj = {k: np.zeros(s, target)
                for k, s in self._proj_shapes().items()}
        pmap = {"multi_modal_projector.ln_pre.weight": ("ln_pre", False),
                "multi_modal_projector.ln_mid.weight": ("ln_mid", False),
                "multi_modal_projector.ln_post.weight": ("ln_post", False),
                "multi_modal_projector.linear_1.weight": ("w1", True),
                "multi_modal_projector.linear_2.weight": ("w2", True)}

        def route(ws):
            for name, w in ws:
                if name.startswith("language_model."):
                    name = name[len("language_model."):]
                if name.startswith("audio_tower."):
                    self.audio.load(name[len("audio_tower."):],
                                    np.asarray(w), abufs, target)
                    continue
                m = pmap.get(name)
                if m is not None:
                    key, tr = m
                    if key in proj:
                        w = np.asarray(w)
                        proj[key] = (w.T if tr else w).astype(target)
                    continue
                yield name, w

        params = super().load_weights(route(weights))
        params["audio"] = abufs
        params["audio_proj"] = proj
        return params

    def param_specs(self):
        specs = super().param_specs()
        specs["audio"] = self.audio.specs()
        specs["audio_proj"] = {k: P() for k in self._proj_shapes()}
        return specs

    def _rms(self, x, w):
        from aphrodite_tpu.layers.common import rms_norm
        return rms_norm(x, w, 1e-6)

    def _encode(self, params, features, feat_lens):
        enc = self.audio.encode(params["audio"], features, feat_lens)
        N, S, D = enc.shape
        sf = self.stack_factor
        S_pad = (S + sf - 1) // sf * sf
        x = jnp.pad(enc, ((0, 0), (0, S_pad - S), (0, 0)))
        x = x.reshape(N, S_pad // sf, D * sf)
        x = self._rms(x, params["audio_proj"]["ln_pre"])
        x = jnp.dot(x, params["audio_proj"]["w1"],
                    preferred_element_type=jnp.float32).astype(enc.dtype)
        if self.projector_act == "swiglu":
            d = x.shape[-1] // 2
            x = x[..., :d] * jax.nn.silu(x[..., d:])  # MulAndSilu
        else:
            x = jax.nn.gelu(x)
        if self.projector_ln_mid:
            x = self._rms(x, params["audio_proj"]["ln_mid"])
        x = jnp.dot(x, params["audio_proj"]["w2"],
                    preferred_element_type=jnp.float32).astype(enc.dtype)
        if not self.projector_ln_mid:
            x = self._rms(x, params["audio_proj"]["ln_post"])
        pieces = []
        for i, fl in enumerate(feat_lens):
            conv_len = (fl - 1) // 2 + 1
            n_tok = (conv_len + sf - 1) // sf
            pieces.append(x[i, :n_tok])
        return jnp.concatenate(pieces, axis=0) if len(pieces) > 1 \
            else pieces[0]

    def encode_images(self, params, pixel_values, feat_lens):
        key = tuple(int(x) for x in feat_lens)
        fn = self._encode_cache.get(key)
        if fn is None:
            fn = jax.jit(partial(self._encode, feat_lens=key))
            self._encode_cache[key] = fn
        return fn(params, pixel_values)

    encode_audio = encode_images


def ultravox_token_count(mel_len: int, stack_factor: int) -> int:
    conv_len = (mel_len - 1) // 2 + 1
    return (conv_len + stack_factor - 1) // stack_factor


_UV_CACHE: dict[type, type] = {}


def UltravoxModel(config):
    """Factory: pick the language backbone by text_config.model_type
    (reference ultravox.py wraps any causal LM; llama-family here)."""
    from aphrodite_tpu.models.llama import (LlamaForCausalLM,
                                            MistralForCausalLM)
    mt = getattr(config.text_config, "model_type", "llama")
    base = {"llama": LlamaForCausalLM, "mistral": MistralForCausalLM,
            "qwen2": Qwen2ForCausalLM}.get(mt)
    if base is None:
        raise ValueError(f"Ultravox over model_type={mt!r} is not wired up")
    cls = _UV_CACHE.get(base)
    if cls is None:
        cls = type("Ultravox" + base.__name__, (_UltravoxMixin, base), {})
        _UV_CACHE[base] = cls
    model = cls(config)
    model._mm_init(config)
    return model
