"""GPT-2 / OPT / GPT-NeoX decoder family.

Parity: aphrodite/modeling/models/{gpt2,opt,gpt_neox}.py — the "classic"
decoder mechanisms the llama family lacks: learned absolute position
embeddings (with OPT's +2 offset), LayerNorm with bias, fused QKV in both
layouts (GPT-2's Conv1D [in, 3D] and NeoX's per-head-interleaved
[D, (heads, 3, hd)]), post-LN residuals (OPT-350m), parallel
attention+MLP residuals (NeoX), and partial rotary (rotary_pct). One
configurable class serves all three; everything else (paged KV,
continuous batching, sampler, TP specs) is shared infrastructure.
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.attention import (AttentionMetadata, paged_attention,
                                     write_kv)
from aphrodite_tpu.config import ModelConfig
from aphrodite_tpu.layers.rotary import (RopeConfig, apply_rope,
                                         compute_cos_sin, compute_inv_freq)
from aphrodite_tpu.models.vision import layer_norm
from aphrodite_tpu.utils import jax_dtype

_ACTS = {
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_fast": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
}


class _ClassicDecoder:
    """Shared forward for LN-bias decoders with fused/split QKV."""

    # Arch knobs (overridden per subclass).
    positions: str = "learned"      # learned | rope
    pos_offset: int = 0
    parallel_residual: bool = False
    pre_ln: bool = True
    # Interface parity.
    pp_size = 1
    mesh = None
    sequence_parallel = False
    quant_fmt = None
    sliding_window = None
    is_ssm = False

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.text_config
        self.dtype = jax_dtype(config.dtype)
        self.hidden_size = config.hidden_size
        self.num_layers = config.num_layers
        self.num_heads = config.num_attention_heads
        self.num_kv_heads = self.num_heads
        self.head_dim = self.hidden_size // self.num_heads
        self.vocab_size = config.vocab_size
        self.scale = self.head_dim ** -0.5
        self._setup(hf)
        if self.positions == "rope":
            pct = getattr(hf, "rotary_pct",
                          getattr(hf, "partial_rotary_factor", 1.0))
            self.rope = RopeConfig(
                head_dim=self.head_dim,
                rotary_dim=int(self.head_dim * pct),
                base=getattr(hf, "rotary_emb_base",
                             getattr(hf, "rope_theta", 10000.0)),
                max_position=getattr(hf, "max_position_embeddings", 2048),
                scaling=getattr(hf, "rope_scaling", None))
            inv_freq, mscale = compute_inv_freq(self.rope)
            self._inv_freq = jnp.asarray(inv_freq)
            self._rope_mscale = mscale

    # ------------------------------------------------------------------ params
    def _layer_shapes(self) -> dict[str, tuple]:
        H, I, L = self.hidden_size, self.intermediate_size, self.num_layers
        return {
            "ln1_w": (L, H), "ln1_b": (L, H),
            "wq": (L, H, H), "bq": (L, H),
            "wk": (L, H, H), "bk": (L, H),
            "wv": (L, H, H), "bv": (L, H),
            "wo": (L, H, H), "bo": (L, H),
            "ln2_w": (L, H), "ln2_b": (L, H),
            "fc1_w": (L, H, I), "fc1_b": (L, I),
            "fc2_w": (L, I, H), "fc2_b": (L, H),
        }

    def init_dummy_params(self, rng: jax.Array) -> dict:
        keys = iter(jax.random.split(rng, 64))

        def mk(shape):
            return (0.02 * jax.random.normal(next(keys), shape,
                                             jnp.float32)).astype(self.dtype)
        layers = {}
        for k, s in self._layer_shapes().items():
            layers[k] = jnp.ones(s, self.dtype) if k.endswith("ln_w") or \
                "ln" in k and k.endswith("_w") else (
                jnp.zeros(s, self.dtype) if k.endswith("_b")
                or k.startswith("b") else mk(s))
        params = {"embed": mk((self.vocab_size, self.hidden_size)),
                  "layers": layers,
                  "final_ln_w": jnp.ones((self.hidden_size,), self.dtype),
                  "final_ln_b": jnp.zeros((self.hidden_size,), self.dtype)}
        if self.positions == "learned":
            params["pos_embed"] = mk((self.max_positions, self.hidden_size))
        if not self.tie_embeddings:
            params["lm_head"] = mk((self.hidden_size, self.vocab_size))
        return params

    def param_specs(self) -> dict:
        layers = {}
        for k in self._layer_shapes():
            if k in ("wq", "wk", "wv", "fc1_w"):
                layers[k] = P(None, None, "tp")
            elif k in ("wo", "fc2_w"):
                layers[k] = P(None, "tp", None)
            elif k in ("bq", "bk", "bv", "fc1_b"):
                layers[k] = P(None, "tp")
            else:
                layers[k] = P()
        specs = {"embed": P("tp", None), "layers": layers,
                 "final_ln_w": P(), "final_ln_b": P()}
        if self.positions == "learned":
            specs["pos_embed"] = P()
        if not self.tie_embeddings:
            specs["lm_head"] = P(None, "tp")
        return specs

    # ----------------------------------------------------------------- forward
    def apply(self, params: dict, input_ids: jax.Array, kv_cache: jax.Array,
              md: AttentionMetadata, *, use_pallas: bool = False,
              lora: dict | None = None, mm=None):
        if lora is not None:
            lora = {k: v for k, v in lora.items()
                    if not k.endswith(("_embed", "_lm_head"))}
        T = input_ids.shape[0]
        nh, hd, D = self.num_heads, self.head_dim, self.hidden_size
        x = jnp.take(params["embed"], input_ids, axis=0)
        if mm is not None:
            mm_embeds, mm_idx = mm
            x = x.at[mm_idx].set(mm_embeds.astype(x.dtype), mode="drop")
        if self.positions == "learned":
            x = x + jnp.take(params["pos_embed"],
                             md.token_pos + self.pos_offset, axis=0)
            cos = sin = None
        else:
            cos, sin = compute_cos_sin(md.token_pos, self._inv_freq,
                                       self._rope_mscale)
        eps = self.ln_eps

        def lin(h, key, lp):
            y = jnp.dot(h, lp[key])
            A = lp.get("lora_A_" + key)
            if A is not None:
                from aphrodite_tpu.lora.models import lora_apply
                y = y + lora_apply(h, A, lp["lora_B_" + key],
                                   md.lora_slots)
            return y

        def attn(h, lp, kvc):
            q = (lin(h, "wq", lp) + lp["bq"]).reshape(T, nh, hd)
            k = (lin(h, "wk", lp) + lp["bk"]).reshape(T, nh, hd)
            v = (lin(h, "wv", lp) + lp["bv"]).reshape(T, nh, hd)
            if cos is not None:
                q = apply_rope(q, cos, sin)
                k = apply_rope(k, cos, sin)
            kvc = write_kv(kvc, k, v, md.slot_mapping)
            o = paged_attention(q, kvc, md, self.scale,
                                use_pallas=use_pallas)
            return lin(o.reshape(T, D), "wo", lp) + lp["bo"], kvc

        def mlp(h, lp):
            h = self.act(lin(h, "fc1_w", lp) + lp["fc1_b"])
            return lin(h, "fc2_w", lp) + lp["fc2_b"]

        def layer(x, xs):
            lp, kvc = xs
            if self.parallel_residual:
                a, kvc = attn(layer_norm(x, lp["ln1_w"], lp["ln1_b"], eps),
                              lp, kvc)
                m = mlp(layer_norm(x, lp["ln2_w"], lp["ln2_b"], eps), lp)
                return x + a + m, kvc
            if self.pre_ln:
                a, kvc = attn(layer_norm(x, lp["ln1_w"], lp["ln1_b"], eps),
                              lp, kvc)
                x = x + a
                x = x + mlp(layer_norm(x, lp["ln2_w"], lp["ln2_b"], eps),
                            lp)
                return x, kvc
            # Post-LN (OPT-350m style).
            a, kvc = attn(x, lp, kvc)
            x = layer_norm(x + a, lp["ln1_w"], lp["ln1_b"], eps)
            x = layer_norm(x + mlp(x, lp), lp["ln2_w"], lp["ln2_b"], eps)
            return x, kvc

        scan_layers = (params["layers"] if lora is None
                       else {**params["layers"], **lora})
        x, kv_cache = jax.lax.scan(layer, x, (scan_layers, kv_cache))
        if self.final_ln:
            x = layer_norm(x, params["final_ln_w"], params["final_ln_b"],
                           eps)
        return x, kv_cache

    def compute_logits(self, params: dict, hidden: jax.Array) -> jax.Array:
        head = params["embed"].T if self.tie_embeddings else params["lm_head"]
        return jnp.dot(hidden, head, preferred_element_type=jnp.float32)


class GPT2LMHeadModel(_ClassicDecoder):
    """HF arch 'GPT2LMHeadModel': Conv1D fused c_attn, gelu_new, wpe."""

    def _setup(self, hf):
        self.intermediate_size = getattr(hf, "n_inner", None) or \
            4 * self.hidden_size
        self.max_positions = hf.max_position_embeddings
        self.ln_eps = getattr(hf, "layer_norm_epsilon", 1e-5)
        self.act = _ACTS[getattr(hf, "activation_function", "gelu_new")]
        self.tie_embeddings = True
        self.final_ln = True

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        bufs = {k: np.zeros(s, target)
                for k, s in self._layer_shapes().items()}
        params: dict = {"layers": bufs}
        D = self.hidden_size
        for name, w in weights:
            w = np.asarray(w)
            name = name.removeprefix("transformer.")
            if name == "wte.weight":
                params["embed"] = w.astype(target)
            elif name == "wpe.weight":
                params["pos_embed"] = w.astype(target)
            elif name == "ln_f.weight":
                params["final_ln_w"] = w.astype(target)
            elif name == "ln_f.bias":
                params["final_ln_b"] = w.astype(target)
            elif name.startswith("h."):
                idx_s, sub = name[2:].split(".", 1)
                li = int(idx_s)
                # GPT-2 Conv1D weights are [in, out] already.
                if sub == "attn.c_attn.weight":
                    bufs["wq"][li] = w[:, :D].astype(target)
                    bufs["wk"][li] = w[:, D:2 * D].astype(target)
                    bufs["wv"][li] = w[:, 2 * D:].astype(target)
                elif sub == "attn.c_attn.bias":
                    bufs["bq"][li] = w[:D].astype(target)
                    bufs["bk"][li] = w[D:2 * D].astype(target)
                    bufs["bv"][li] = w[2 * D:].astype(target)
                else:
                    m = {"ln_1.weight": "ln1_w", "ln_1.bias": "ln1_b",
                         "attn.c_proj.weight": "wo",
                         "attn.c_proj.bias": "bo",
                         "ln_2.weight": "ln2_w", "ln_2.bias": "ln2_b",
                         "mlp.c_fc.weight": "fc1_w",
                         "mlp.c_fc.bias": "fc1_b",
                         "mlp.c_proj.weight": "fc2_w",
                         "mlp.c_proj.bias": "fc2_b"}.get(sub)
                    if m:
                        bufs[m][li] = w.astype(target)
        if "embed" not in params:
            raise ValueError("missing transformer.wte.weight")
        return params


class OPTForCausalLM(_ClassicDecoder):
    """HF arch 'OPTForCausalLM': +2 position offset, relu, optional
    post-LN (do_layer_norm_before=False on 350m)."""

    pos_offset = 2

    def _setup(self, hf):
        self.intermediate_size = hf.ffn_dim
        self.max_positions = hf.max_position_embeddings + 2
        self.ln_eps = 1e-5
        self.act = _ACTS[getattr(hf, "activation_function", "relu")]
        self.tie_embeddings = getattr(hf, "tie_word_embeddings", True)
        self.pre_ln = getattr(hf, "do_layer_norm_before", True)
        # final LN exists only in the pre-LN variants.
        self.final_ln = self.pre_ln

    _MAP = {
        "self_attn.q_proj.weight": ("wq", True),
        "self_attn.q_proj.bias": ("bq", False),
        "self_attn.k_proj.weight": ("wk", True),
        "self_attn.k_proj.bias": ("bk", False),
        "self_attn.v_proj.weight": ("wv", True),
        "self_attn.v_proj.bias": ("bv", False),
        "self_attn.out_proj.weight": ("wo", True),
        "self_attn.out_proj.bias": ("bo", False),
        "self_attn_layer_norm.weight": ("ln1_w", False),
        "self_attn_layer_norm.bias": ("ln1_b", False),
        "final_layer_norm.weight": ("ln2_w", False),
        "final_layer_norm.bias": ("ln2_b", False),
        "fc1.weight": ("fc1_w", True), "fc1.bias": ("fc1_b", False),
        "fc2.weight": ("fc2_w", True), "fc2.bias": ("fc2_b", False),
    }

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        bufs = {k: np.zeros(s, target)
                for k, s in self._layer_shapes().items()}
        params: dict = {"layers": bufs}
        for name, w in weights:
            w = np.asarray(w)
            name = name.removeprefix("model.")
            if name == "decoder.embed_tokens.weight":
                params["embed"] = w.astype(target)
            elif name == "decoder.embed_positions.weight":
                params["pos_embed"] = w.astype(target)
            elif name == "decoder.final_layer_norm.weight":
                params["final_ln_w"] = w.astype(target)
            elif name == "decoder.final_layer_norm.bias":
                params["final_ln_b"] = w.astype(target)
            elif name == "lm_head.weight":
                if not self.tie_embeddings:
                    params["lm_head"] = w.T.astype(target)
            elif name.startswith("decoder.layers."):
                idx_s, sub = name[len("decoder.layers."):].split(".", 1)
                m = self._MAP.get(sub)
                if m:
                    key, tr = m
                    bufs[key][int(idx_s)] = (w.T if tr else w).astype(
                        target)
        if "embed" not in params:
            raise ValueError("missing decoder.embed_tokens.weight")
        return params


class GPTNeoXForCausalLM(_ClassicDecoder):
    """HF arch 'GPTNeoXForCausalLM' (Pythia): per-head-interleaved fused
    QKV, partial rotary, parallel residual, untied embed_out."""

    positions = "rope"
    # LoRA checkpoints target the FUSED query_key_value projection: the
    # shared A lands on wq/wk/wv and B splits evenly across the fused
    # output dim (lora/models.py fused mapping).
    lora_target_map = {
        "query_key_value": ("wq", "wk", "wv"),
        "dense": "wo",
        "dense_h_to_4h": "fc1_w",
        "dense_4h_to_h": "fc2_w",
    }

    def lora_split_fused(self, keys, w):
        # B [out=3*D, r] rows interleaved (head, (q,k,v), hd) exactly like
        # the base query_key_value weight above.
        nh, hd = self.num_heads, self.head_dim
        w4 = w.reshape(nh, 3, hd, -1)
        return {k: w4[:, j].reshape(nh * hd, -1)
                for j, k in enumerate(keys)}

    def _setup(self, hf):
        self.intermediate_size = hf.intermediate_size
        self.max_positions = hf.max_position_embeddings
        self.ln_eps = getattr(hf, "layer_norm_eps", 1e-5)
        self.act = _ACTS[getattr(hf, "hidden_act", "gelu")]
        self.tie_embeddings = getattr(hf, "tie_word_embeddings", False)
        self.parallel_residual = getattr(hf, "use_parallel_residual", True)
        self.final_ln = True

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        bufs = {k: np.zeros(s, target)
                for k, s in self._layer_shapes().items()}
        params: dict = {"layers": bufs}
        nh, hd, D = self.num_heads, self.head_dim, self.hidden_size
        table = {
            "input_layernorm.weight": ("ln1_w", False),
            "input_layernorm.bias": ("ln1_b", False),
            "post_attention_layernorm.weight": ("ln2_w", False),
            "post_attention_layernorm.bias": ("ln2_b", False),
            "attention.dense.weight": ("wo", True),
            "attention.dense.bias": ("bo", False),
            "mlp.dense_h_to_4h.weight": ("fc1_w", True),
            "mlp.dense_h_to_4h.bias": ("fc1_b", False),
            "mlp.dense_4h_to_h.weight": ("fc2_w", True),
            "mlp.dense_4h_to_h.bias": ("fc2_b", False),
        }
        for name, w in weights:
            w = np.asarray(w)
            name = name.removeprefix("gpt_neox.")
            if name == "embed_in.weight":
                params["embed"] = w.astype(target)
            elif name == "embed_out.weight":
                params["lm_head"] = w.T.astype(target)
            elif name == "final_layer_norm.weight":
                params["final_ln_w"] = w.astype(target)
            elif name == "final_layer_norm.bias":
                params["final_ln_b"] = w.astype(target)
            elif name.startswith("layers."):
                idx_s, sub = name[len("layers."):].split(".", 1)
                li = int(idx_s)
                if sub == "attention.query_key_value.weight":
                    # [3*D, D] with rows interleaved (head, (q,k,v), hd)
                    qkv = w.reshape(nh, 3, hd, D)
                    bufs["wq"][li] = qkv[:, 0].reshape(D, D).T.astype(target)
                    bufs["wk"][li] = qkv[:, 1].reshape(D, D).T.astype(target)
                    bufs["wv"][li] = qkv[:, 2].reshape(D, D).T.astype(target)
                elif sub == "attention.query_key_value.bias":
                    qkv = w.reshape(nh, 3, hd)
                    bufs["bq"][li] = qkv[:, 0].reshape(D).astype(target)
                    bufs["bk"][li] = qkv[:, 1].reshape(D).astype(target)
                    bufs["bv"][li] = qkv[:, 2].reshape(D).astype(target)
                else:
                    m = table.get(sub)
                    if m:
                        key, tr = m
                        bufs[key][li] = (w.T if tr else w).astype(target)
        if "embed" not in params:
            raise ValueError("missing gpt_neox.embed_in.weight")
        return params
