"""Chameleon: early-fusion VLM — images become discrete BPE tokens.

Parity: aphrodite/modeling/models/chameleon.py. The text model is llama
with per-head DISTINCT q/k LayerNorms (ChameleonLayerNorm: stats over
head_dim, each head its own gamma/beta, applied BEFORE rope). Images are
tokenized by the VQGAN encoder (GroupNorm/swish conv resnets + vanilla
attention blocks + nearest-codebook quantization), the code indices mapped
into BPE vocabulary ids via ``config.vocabulary_map`` (IMGIMG tokens), and
the resulting rows enter the decoder as ordinary token embeddings through
the multimodal scatter (each image = latent_grid^2 placeholder tokens).

The 30B 'swin norm' layer ordering is not implemented (7B layout only).
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.llama import LlamaForCausalLM


def _group_norm(x, w, b, groups=32, eps=1e-6):
    """x [N, C, H, W] GroupNorm."""
    N, C, H, W = x.shape
    xf = x.astype(jnp.float32).reshape(N, groups, C // groups, H, W)
    mu = jnp.mean(xf, axis=(2, 3, 4), keepdims=True)
    var = jnp.var(xf, axis=(2, 3, 4), keepdims=True)
    xf = (xf - mu) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(N, C, H, W)
    return xf * w[None, :, None, None] + b[None, :, None, None]


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _conv(x, w, b=None, stride=1, padding=1):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if b is not None:
        out = out + b[None, :, None, None]
    return out


class ChameleonVQTokenizer:
    """Functional ChameleonVQVAE encoder + quantizer. Parameters are kept
    as the flat HF name->array dict (heterogeneous conv stacks; runs once
    per image in the encoder cache, python-structured forward)."""

    def __init__(self, vq_config) -> None:
        vc = vq_config
        self.base = vc.base_channels
        self.mult = tuple(vc.channel_multiplier)
        self.levels = len(self.mult)
        self.res_blocks = vc.num_res_blocks
        self.resolution = vc.resolution
        self.attn_res = tuple(getattr(vc, "attn_resolutions", None) or ())
        self.latent = vc.latent_channels
        self.embed_dim = vc.embed_dim
        self.num_codes = vc.num_embeddings
        self.grid = self.resolution // (2 ** (self.levels - 1))

    def tokens_per_image(self) -> int:
        return self.grid * self.grid

    def _resnet(self, p, pre, x, cin, cout):
        h = _swish(_group_norm(x, p[pre + "norm1.weight"],
                               p[pre + "norm1.bias"]))
        h = _conv(h, p[pre + "conv1.weight"], p[pre + "conv1.bias"])
        h = _swish(_group_norm(h, p[pre + "norm2.weight"],
                               p[pre + "norm2.bias"]))
        h = _conv(h, p[pre + "conv2.weight"], p[pre + "conv2.bias"])
        if cin != cout:
            if pre + "nin_shortcut.weight" in p:
                x = _conv(x, p[pre + "nin_shortcut.weight"],
                          p[pre + "nin_shortcut.bias"], padding=0)
            else:
                x = _conv(x, p[pre + "conv_shortcut.weight"],
                          p[pre + "conv_shortcut.bias"])
        return x + h

    def _attn(self, p, pre, x):
        h = _group_norm(x, p[pre + "norm.weight"], p[pre + "norm.bias"])
        q = _conv(h, p[pre + "q.weight"], p[pre + "q.bias"], padding=0)
        k = _conv(h, p[pre + "k.weight"], p[pre + "k.bias"], padding=0)
        v = _conv(h, p[pre + "v.weight"], p[pre + "v.bias"], padding=0)
        N, C, H, W = q.shape
        qf = q.reshape(N, C, H * W).transpose(0, 2, 1).astype(jnp.float32)
        kf = k.reshape(N, C, H * W).astype(jnp.float32)
        a = jax.nn.softmax(jnp.einsum("nqc,nck->nqk", qf, kf)
                           * (C ** -0.5), axis=2)
        vf = v.reshape(N, C, H * W).astype(jnp.float32)
        o = jnp.einsum("nck,nqk->ncq", vf, a).reshape(N, C, H, W)
        o = _conv(o.astype(x.dtype), p[pre + "proj_out.weight"],
                  p[pre + "proj_out.bias"], padding=0)
        return x + o

    def encode_indices(self, p: dict, pixel_values: jax.Array) -> jax.Array:
        """[N, 3, S, S] -> code indices [N, grid*grid] (int32)."""
        E = "encoder."
        x = _conv(pixel_values.astype(jnp.float32),
                  p[E + "conv_in.weight"], p[E + "conv_in.bias"])
        curr_res = self.resolution
        cin = self.base
        for lvl in range(self.levels):
            cout = self.base * self.mult[lvl]
            for blk in range(self.res_blocks):
                pre = f"{E}down.{lvl}.block.{blk}."
                x = self._resnet(p, pre, x, cin, cout)
                cin = cout
                apre = f"{E}down.{lvl}.attn.{blk}."
                if apre + "norm.weight" in p:
                    x = self._attn(p, apre, x)
            if lvl != self.levels - 1:
                # Downsample: pad right/bottom by 1, stride-2 valid conv.
                x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1)))
                x = jax.lax.conv_general_dilated(
                    x, p[f"{E}down.{lvl}.downsample.conv.weight"],
                    window_strides=(2, 2), padding="VALID",
                    dimension_numbers=("NCHW", "OIHW", "NCHW"))
                x = x + p[f"{E}down.{lvl}.downsample.conv.bias"][
                    None, :, None, None]
                curr_res //= 2
        x = self._resnet(p, E + "mid.block_1.", x, cin, cin)
        if E + "mid.attn_1.norm.weight" in p:
            x = self._attn(p, E + "mid.attn_1.", x)
        x = self._resnet(p, E + "mid.block_2.", x, cin, cin)
        x = _swish(_group_norm(x, p[E + "norm_out.weight"],
                               p[E + "norm_out.bias"]))
        x = _conv(x, p[E + "conv_out.weight"], p[E + "conv_out.bias"])
        x = _conv(x, p["quant_conv.weight"], p["quant_conv.bias"],
                  padding=0)
        # Nearest-codebook quantization over [N, H, W] latents.
        N, C, H, W = x.shape
        z = x.transpose(0, 2, 3, 1).reshape(-1, C).astype(jnp.float32)
        book = p["quantize.embedding.weight"].astype(jnp.float32)
        d = (jnp.sum(z * z, axis=1, keepdims=True)
             + jnp.sum(book * book, axis=1)[None]
             - 2.0 * jnp.dot(z, book.T))
        idx = jnp.argmin(d, axis=1).astype(jnp.int32)
        return idx.reshape(N, H * W)


class ChameleonForConditionalGeneration(LlamaForCausalLM):

    is_multimodal = True

    def __init__(self, config):
        super().__init__(config)
        hf = config.text_config
        if getattr(hf, "swin_norm", False):
            raise NotImplementedError(
                "Chameleon swin_norm layer ordering (30B): follow-up")
        self.vq = ChameleonVQTokenizer(config.hf_config.vq_config)
        vmap = dict(getattr(config.hf_config, "vocabulary_map", None) or {})
        self.image_token_id = vmap.get("<image>")
        # img code index -> BPE id (IMGIMG name remapping, HF
        # ChameleonImageVocabularyMapping semantics).
        chr_map = {chr(ord("A") + i): str(i) for i in range(10)}
        img2bpe = {}
        for name, tok in vmap.items():
            if name.startswith("IMGIMG"):
                digits = "".join(chr_map.get(c, c) for c in name[6:-1])
                img2bpe[int(digits)] = tok
        table = np.zeros((max(img2bpe) + 1 if img2bpe else 1,), np.int32)
        for k, v in img2bpe.items():
            table[k] = v
        self._img2bpe = table
        mask = np.zeros((self.vocab_size,), bool)
        if img2bpe:
            mask[np.unique(table)] = True
        self._img_token_mask = mask

    def _layer_shapes(self):
        shapes = super()._layer_shapes()
        L, nq, nkv, hd = (self.num_layers, self.num_heads,
                          self.num_kv_heads, self.head_dim)
        shapes.update(q_ln_w=(L, nq, hd), q_ln_b=(L, nq, hd),
                      k_ln_w=(L, nkv, hd), k_ln_b=(L, nkv, hd))
        return shapes

    _HF_LAYER_MAP = dict(LlamaForCausalLM._HF_LAYER_MAP)
    _HF_LAYER_MAP.update({
        "self_attn.q_norm.weight": ("q_ln_w", False),
        "self_attn.q_norm.bias": ("q_ln_b", False),
        "self_attn.k_norm.weight": ("k_ln_w", False),
        "self_attn.k_norm.bias": ("k_ln_b", False),
    })

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        vq: dict = {}

        def route(ws):
            for name, w in ws:
                if name.startswith("model.vqmodel."):
                    vq[name[len("model.vqmodel."):]] = \
                        np.asarray(w, np.float32)
                    continue
                yield name, w

        params = super().load_weights(route(weights))
        params["vqmodel"] = vq
        return params

    def init_dummy_params(self, rng):
        params = super().init_dummy_params(rng)
        params["vqmodel"] = {}  # dummy mode serves text only
        return params

    def param_specs(self):
        specs = super().param_specs()
        specs["layers"].update(q_ln_w=P(), q_ln_b=P(), k_ln_w=P(),
                               k_ln_b=P())
        specs["vqmodel"] = None  # replicated flat dict
        return specs

    def compute_logits(self, params: dict, hidden: jax.Array) -> jax.Array:
        """Image BPE tokens are masked out: text generation must not emit
        VQ codes (HF ChameleonForConditionalGeneration logit masking)."""
        logits = super().compute_logits(params, hidden)
        return jnp.where(jnp.asarray(self._img_token_mask)[None, :],
                         jnp.finfo(jnp.float32).min, logits)

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        """[N,3,S,S] -> token-embedding rows (the early-fusion trick: the
        'features' ARE embeddings of the mapped BPE ids)."""
        if not params["vqmodel"]:
            raise ValueError("checkpoint carries no VQ model weights")
        idx = self.vq.encode_indices(params["vqmodel"], pixel_values)
        bpe = jnp.take(jnp.asarray(self._img2bpe), idx, axis=0)
        rows = jnp.take(params["embed"], bpe.reshape(-1), axis=0)
        return rows
