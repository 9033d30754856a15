"""DeepSeek multi-token-prediction (MTP) speculative head.

Parity: the reference's DeepSeekMTPModel speculative family (registry
_SPECULATIVE_DECODING_MODELS). The MTP module is one extra DeepSeek decoder
layer appended to the target: the draft input at feature position j is
``eh_proj(concat(enorm(embed(t_{j+1})), hnorm(f_j)))`` where f_j is the
target's hidden stream; the layer is a full MLA + (DeepSeek-MoE or dense)
block, and logits come from the MTP's own ``shared_head`` (RMSNorm + head).

Runs through the same lockstep EagleProposer (spec_decode/eagle.py): the
head exposes the identical apply/logits interface; its paged cache reuses
the target's latent-MQA geometry (kvh=1, width R+rope), so both Pallas
attention kernels serve the draft too.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from aphrodite_tpu.layers.common import rms_norm
from aphrodite_tpu.layers.rotary import compute_cos_sin
from aphrodite_tpu.utils import logger


class DeepseekMTPHead:
    """One DeepSeek layer over eh_proj-fused (embed, feature) inputs."""

    def __init__(self, target_model):
        t = target_model
        self.t = t
        self.hidden_size = t.hidden_size
        self.num_heads = t.num_heads
        self.num_kv_heads = 1
        self.head_dim = t.head_dim  # latent R + rope
        self.num_layers = 1
        self.vocab_size = t.vocab_size
        self.rms_eps = t.rms_eps
        self.dtype = t.dtype
        # The MTP layer is MoE iff the target has routed experts.
        self.is_moe = getattr(t, "num_experts", None) is not None

    # ------------------------------------------------------------------ params
    def _layer_shapes(self) -> dict:
        """Single-layer (unstacked) versions of the target's per-layer
        shapes, so the target's _attention/_moe_mlp consume them as a
        scan-slice lp/mp dict."""
        def unstack(shapes):
            return {k: s[1:] for k, s in shapes.items()}
        shapes = unstack(self.t._common_shapes())
        if self.is_moe:
            mp = {k: s[1:] for k, s in self.t._moe_shapes().items()}
        else:
            mp = {k: s[1:] for k, s in self.t._dense_shapes().items()}
        return shapes, mp

    def init_dummy_params(self, rng: jax.Array) -> dict:
        H = self.hidden_size
        keys = iter(jax.random.split(rng, 64))

        def mk(shape, scale=0.02):
            return (scale * jax.random.normal(next(keys), shape,
                                              jnp.float32)
                    ).astype(self.dtype)

        def fill(shapes):
            out = {}
            for k, s in shapes.items():
                if "norm" in k:
                    out[k] = jnp.ones(s, self.dtype)
                elif k == "router_bias":
                    out[k] = jnp.zeros(s, jnp.float32)
                else:
                    out[k] = mk(s)
            return out

        lp_shapes, mp_shapes = self._layer_shapes()
        params = {
            "embed": mk((self.vocab_size, H)),
            "enorm": jnp.ones((H,), self.dtype),
            "hnorm": jnp.ones((H,), self.dtype),
            "eh_proj": mk((2 * H, H)),
            "layer": fill(lp_shapes),
            "mlp": fill(mp_shapes),
            "head_norm": jnp.ones((H,), self.dtype),
            "head_w": mk((H, self.vocab_size)),
        }
        return params

    def load_weights(self, weights) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        lp_shapes, mp_shapes = self._layer_shapes()
        lp = {k: np.zeros(s, target) for k, s in lp_shapes.items()}
        mp = {k: np.zeros(s, np.float32 if k == "router_bias" else target)
              for k, s in mp_shapes.items()}
        params: dict = {"layer": lp, "mlp": mp}
        t = self.t
        nq, R = t.num_heads, t.kv_lora_rank
        attn_map = {
            "q_proj.weight": ("wq", True),
            "q_a_proj.weight": ("wq_a", True),
            "q_a_layernorm.weight": ("q_a_norm", False),
            "q_b_proj.weight": ("wq_b", True),
            "kv_a_proj_with_mqa.weight": ("wkv_a", True),
            "kv_a_layernorm.weight": ("kv_a_norm", False),
            "o_proj.weight": ("wo", True),
        }
        mlp_map = {"gate_proj": "gate", "up_proj": "up", "down_proj": "down"}
        for name, w in weights:
            w = np.asarray(w)
            # Accept both full-target exports (model.layers.<L>.*) and
            # standalone MTP modules.
            if name.startswith("model.layers."):
                name = name.split(".", 3)[-1]
            name = name.removeprefix("model.").removeprefix("mtp.")
            if name == "embed_tokens.weight":
                params["embed"] = w.astype(target)
            elif name == "enorm.weight":
                params["enorm"] = w.astype(target)
            elif name == "hnorm.weight":
                params["hnorm"] = w.astype(target)
            elif name == "eh_proj.weight":
                params["eh_proj"] = w.T.astype(target)
            elif name == "shared_head.norm.weight":
                params["head_norm"] = w.astype(target)
            elif name == "shared_head.head.weight":
                params["head_w"] = w.T.astype(target)
            elif name == "input_layernorm.weight":
                lp["input_norm"][...] = w.astype(target)
            elif name == "post_attention_layernorm.weight":
                lp["post_norm"][...] = w.astype(target)
            elif name.startswith("self_attn."):
                suff = name[len("self_attn."):]
                if suff == "kv_b_proj.weight":
                    kv_b = w.T.reshape(R, nq,
                                       t.qk_nope_head_dim + t.v_head_dim)
                    lp["w_uk"][...] = \
                        kv_b[..., :t.qk_nope_head_dim].astype(target)
                    lp["w_uv"][...] = \
                        kv_b[..., t.qk_nope_head_dim:].astype(target)
                    continue
                m = attn_map.get(suff)
                if m and m[0] in lp:
                    key, tr = m
                    lp[key][...] = (w.T if tr else w).astype(target)
            elif name.startswith("mlp."):
                suff = name[len("mlp."):]
                if suff == "gate.weight" and "router" in mp:
                    mp["router"][...] = w.T.astype(target)
                elif suff == "gate.e_score_correction_bias" \
                        and "router_bias" in mp:
                    mp["router_bias"][...] = w.astype(np.float32)
                elif suff.startswith("experts."):
                    _, ei, proj, _ = suff.split(".")
                    mp["we_" + mlp_map[proj]][int(ei)] = w.T.astype(target)
                elif suff.startswith("shared_experts."):
                    proj = suff.split(".")[1]
                    key = "ws_" + mlp_map[proj]
                    if key in mp:
                        mp[key][...] = w.T.astype(target)
                elif not self.is_moe:
                    proj = suff.split(".")[0]
                    if proj in mlp_map:
                        mp["w_" + mlp_map[proj]][...] = w.T.astype(target)
            else:
                logger.debug("mtp: skipping weight %s", name)
        if not isinstance(params.get("embed"), np.ndarray):
            raise ValueError("MTP checkpoint missing embed_tokens")
        for k in ("enorm", "hnorm", "eh_proj", "head_norm", "head_w"):
            if k not in params:
                raise ValueError(f"MTP checkpoint missing {k}")
        return params

    # ----------------------------------------------------------------- forward
    def apply(self, params, input_ids, prev_hidden, kv, md,
              use_pallas=False):
        t = self.t
        e = jnp.take(params["embed"], input_ids, axis=0)
        e = rms_norm(e, params["enorm"], self.rms_eps)
        h = rms_norm(prev_hidden.astype(e.dtype), params["hnorm"],
                     self.rms_eps)
        x = jnp.dot(jnp.concatenate([e, h], -1), params["eh_proj"],
                    preferred_element_type=jnp.float32).astype(e.dtype)
        cos, sin = compute_cos_sin(md.token_pos, t._inv_freq,
                                   t._rope_mscale, t._longrope_orig_max)
        x, kvc = t._attention(x, params["layer"], kv[0], cos, sin, md,
                              use_pallas)
        hh = rms_norm(x, params["layer"]["post_norm"], self.rms_eps)
        if self.is_moe:
            y = t._moe_mlp(hh, params["mlp"])
        else:
            y = t._mlp(hh, params["mlp"])
        x = x + y * t.residual_multiplier
        return x, kvc[None]

    def logits(self, target_params, hidden):
        # MTP carries its own shared head (norm + projection).
        h = rms_norm(hidden, self._params_head_norm, self.rms_eps)
        return jnp.dot(h, self._params_head_w,
                       preferred_element_type=jnp.float32)

    def bind_head(self, params) -> None:
        """Stash the shared-head tensors for logits() (the proposer's
        logits() interface only passes target params)."""
        self._params_head_norm = params["head_norm"]
        self._params_head_w = params["head_w"]
