"""Decoder-based embedding / reward / classification models.

The reference serves decoder checkpoints as embedders (e5-mistral,
gte-Qwen2, Qwen2 reward/classifier models — reference
modeling/models/qwen2_rm.py, registry.py:119-158) by running the causal
stack and pooling hidden states. Here the wrapped decoder runs through the
same `apply()` used for generation — a throwaway paged-KV buffer (one page
per row of the padded batch) keeps attention semantics identical — and the
encoder runner pools.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.attention.backend import kv_cache_shape
from aphrodite_tpu.attention.metadata import AttentionMetadata
from aphrodite_tpu.config import ModelConfig


def _decoder_class(config: ModelConfig):
    from aphrodite_tpu.models.registry import get_model_class
    mt = config.text_config.model_type
    arch = {"qwen2": "Qwen2ForCausalLM", "llama": "LlamaForCausalLM",
            "mistral": "MistralForCausalLM", "gemma2": "Gemma2ForCausalLM",
            "qwen3": "Qwen3ForCausalLM", "gemma": "GemmaForCausalLM",
            "phi3": "Phi3ForCausalLM", "glm": "GlmForCausalLM",
            "internlm2": "InternLM2ForCausalLM"}.get(mt)
    if arch is None:
        raise ValueError(f"decoder-embedding for model_type={mt!r} is not "
                         "wired up")
    return get_model_class(arch)


class DecoderEmbeddingModel:
    """Causal decoder served for embeddings (pool with 'last' or 'mean')."""

    is_encoder = True

    def __init__(self, config: ModelConfig):
        self.config = config
        self.inner = _decoder_class(config)(config)
        # Embedding checkpoints ship no lm_head; never require one.
        self.inner.tie_embeddings = True
        self.num_kv_heads = self.inner.num_kv_heads
        self.dtype = self.inner.dtype

    def __getattr__(self, name):
        # Geometry and knob attributes fall through to the wrapped decoder.
        if name.startswith("_") or name == "inner":
            raise AttributeError(name)
        return getattr(self.__dict__["inner"], name)

    # ------------------------------------------------------------- delegate
    def init_dummy_params(self, rng):
        params = self.inner.init_dummy_params(rng)
        params.pop("lm_head", None)
        return self._extra_dummy(params, rng)

    def load_weights(self, weights):
        extra = {}

        def split(ws):
            for name, w in ws:
                if self._take_extra(name, w, extra):
                    continue
                # Bare-Model exports (Qwen2Model.save_pretrained) drop the
                # "model." prefix the CausalLM loader expects.
                if not name.startswith(("model.", "lm_head.")):
                    name = "model." + name
                yield name, w

        params = self.inner.load_weights(split(weights))
        params.update(extra)
        return params

    def param_specs(self):
        specs = self.inner.param_specs()
        specs.pop("lm_head", None)
        self._extra_specs(specs)
        return specs

    # Subclass hooks (score heads etc.).
    def _extra_dummy(self, params, rng):
        return params

    def _take_extra(self, name, w, extra) -> bool:
        return False

    def _extra_specs(self, specs):
        pass

    def _head(self, params, hidden):
        return hidden

    # --------------------------------------------------------------- encode
    def encode(self, params, input_ids, attn_mask, type_ids=None):
        """input_ids [B, S] suffix-padded -> hidden [B, S, H] via the causal
        decoder. One throwaway KV page per row; pads sit after the real
        tokens so causal masking keeps them out of real tokens' context."""
        B, S = input_ids.shape
        inner = self.inner
        kv = jnp.zeros((inner.num_layers,)
                       + kv_cache_shape(B + 1, S, inner.num_kv_heads,
                                        inner.head_dim), self.dtype)
        T = B * S
        token_req = jnp.repeat(jnp.arange(B, dtype=jnp.int32), S)
        token_pos = jnp.tile(jnp.arange(S, dtype=jnp.int32), B)
        slot_mapping = jnp.arange(T, dtype=jnp.int32)
        md = AttentionMetadata(
            token_req_idx=token_req,
            token_pos=token_pos,
            slot_mapping=slot_mapping,
            query_start_loc=jnp.arange(B + 1, dtype=jnp.int32) * S,
            seq_lens=jnp.full((B,), S, jnp.int32),
            block_tables=jnp.arange(B, dtype=jnp.int32)[:, None],
            num_reqs=jnp.int32(B),
            num_tokens=jnp.int32(T),
        )
        hidden, _ = inner.apply(params, input_ids.reshape(T), kv, md)
        return self._head(params, hidden.reshape(B, S, -1))


class Qwen2ForRewardModel(DecoderEmbeddingModel):
    """Reward model: 2-layer score head (H -> H -> 1, ReLU) on each hidden
    state; pool 'last' for the sequence reward. Reference
    modeling/models/qwen2_rm.py."""

    head_out = 1

    def _extra_dummy(self, params, rng):
        H = self.inner.hidden_size
        k1, k2 = jax.random.split(rng)
        params["score0"] = (0.02 * jax.random.normal(
            k1, (H, H), jnp.float32)).astype(self.dtype)
        params["score0_b"] = jnp.zeros((H,), self.dtype)
        params["score2"] = (0.02 * jax.random.normal(
            k2, (H, self.head_out), jnp.float32)).astype(self.dtype)
        return params

    def _take_extra(self, name, w, extra) -> bool:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        m = {"score.0.weight": ("score0", True),
             "score.0.bias": ("score0_b", False),
             "score.2.weight": ("score2", True)}.get(name)
        if m is None:
            return False
        key, tr = m
        w = np.asarray(w)
        extra[key] = (w.T if tr else w).astype(target)
        return True

    def _extra_specs(self, specs):
        specs.update(score0=P(), score0_b=P(), score2=P())

    def _head(self, params, hidden):
        h = jax.nn.relu(jnp.dot(hidden, params["score0"])
                        + params["score0_b"])
        return jnp.dot(h, params["score2"],
                       preferred_element_type=jnp.float32)


class InternLM2ForRewardModel(DecoderEmbeddingModel):
    """InternLM2 reward model: single bias-free ``v_head`` [H -> 1] on each
    hidden state (reference modeling/models/internlm2.py:402-432, pooling
    ALL / last-token for the sequence reward)."""

    def _extra_dummy(self, params, rng):
        H = self.inner.hidden_size
        params["v_head"] = (0.02 * jax.random.normal(
            rng, (H, 1), jnp.float32)).astype(self.dtype)
        return params

    def _take_extra(self, name, w, extra) -> bool:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        if name == "v_head.weight":
            extra["v_head"] = np.asarray(w).T.astype(target)
            return True
        return False

    def _extra_specs(self, specs):
        specs["v_head"] = P()

    def _head(self, params, hidden):
        return jnp.dot(hidden, params["v_head"],
                       preferred_element_type=jnp.float32)


class Qwen2ForSequenceClassification(DecoderEmbeddingModel):
    """Single-linear score head [H -> num_labels]; pool 'last'. Reference
    modeling/models/qwen2_cls.py."""

    def __init__(self, config):
        super().__init__(config)
        self.num_labels = getattr(config.text_config, "num_labels", 2)

    def _extra_dummy(self, params, rng):
        H = self.inner.hidden_size
        params["score"] = (0.02 * jax.random.normal(
            rng, (H, self.num_labels), jnp.float32)).astype(self.dtype)
        return params

    def _take_extra(self, name, w, extra) -> bool:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        if name == "score.weight":
            extra["score"] = np.asarray(w).T.astype(target)
            return True
        return False

    def _extra_specs(self, specs):
        specs["score"] = P()

    def _head(self, params, hidden):
        return jnp.dot(hidden, params["score"],
                       preferred_element_type=jnp.float32)


class JambaForSequenceClassification(Qwen2ForSequenceClassification):
    """Jamba hybrid backbone + single-linear score head (HF
    JambaForSequenceClassification; reference jamba.py classification
    entry). The throwaway forward carries the hybrid cache pytree
    (conv/ssm state slots + one KV segment per row)."""

    def __init__(self, config: ModelConfig):
        self.config = config
        from aphrodite_tpu.models.jamba import JambaForCausalLM
        self.inner = JambaForCausalLM(config)
        self.inner.tie_embeddings = True
        self.num_kv_heads = self.inner.num_kv_heads
        self.dtype = self.inner.dtype
        self.num_labels = getattr(config.text_config, "num_labels", 2)

    def encode(self, params, input_ids, attn_mask, type_ids=None):
        from types import SimpleNamespace
        B, S = input_ids.shape
        inner = self.inner
        cache = inner.init_cache(
            B, cache_config=SimpleNamespace(num_blocks=B + 1, block_size=S),
            kv_dtype=self.dtype)
        T = B * S
        md = AttentionMetadata(
            token_req_idx=jnp.repeat(jnp.arange(B, dtype=jnp.int32), S),
            token_pos=jnp.tile(jnp.arange(S, dtype=jnp.int32), B),
            slot_mapping=jnp.arange(T, dtype=jnp.int32),
            query_start_loc=jnp.arange(B + 1, dtype=jnp.int32) * S,
            seq_lens=jnp.full((B,), S, jnp.int32),
            block_tables=jnp.arange(B, dtype=jnp.int32)[:, None],
            num_reqs=jnp.int32(B),
            num_tokens=jnp.int32(T),
            seg_starts=jnp.arange(B, dtype=jnp.int32) * S,
            state_slots=jnp.arange(B, dtype=jnp.int32),
        )
        hidden, _ = inner.apply(params, input_ids.reshape(T), cache, md)
        return self._head(params, hidden.reshape(B, S, -1))
