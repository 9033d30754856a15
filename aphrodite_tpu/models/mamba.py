"""Mamba (selective state space) models: recurrent cache, no paged KV.

Parity: aphrodite/modeling/models/mamba.py + the selective-scan /
causal-conv1d kernels (kernels/mamba/, SURVEY.md §2.7) and the
MambaCacheManager slot scheme (aphrodite/modeling/models/mamba_cache.py).

TPU-native design: the per-request recurrent state lives in two dense
slot-indexed buffers — ``conv`` [L, slots, d_conv-1, d_inner] and ``ssm``
[L, slots, d_inner, d_state] — donated through the jitted step exactly like
the paged KV cache (the runner assigns a slot per running request;
md.state_slots routes it). The selective scan runs as one
a chunked Pallas selective-scan kernel (ops/selective_scan.py; XLA
``associative_scan`` below the size cutoff) over the *flat ragged token
layout*, with
request isolation handled algebraically: each segment's first token zeroes
its decay coefficient and injects ``decay * h0`` (the slot's resumed state,
or 0 at position 0) into its input term, so one parallel scan serves any
mix of prefills, chunk-resumes and decodes with no cross-request leakage.
The depthwise causal conv is 4 shifted adds with the same
boundary-selection logic pulling history taps from the conv state.
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.attention.metadata import AttentionMetadata
from aphrodite_tpu.config import ModelConfig
from aphrodite_tpu.layers.common import rms_norm
from aphrodite_tpu.utils import jax_dtype


class MambaForCausalLM:
    """Pure Mamba-1 stack (HF ``MambaForCausalLM`` checkpoints)."""

    is_ssm = True
    # Interface parity with decoder models (unused: no paged KV).
    pp_size = 1
    mesh = None
    sequence_parallel = False
    quant_fmt = None

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.text_config
        self.dtype = jax_dtype(config.dtype)
        self.hidden_size = hf.hidden_size
        self.num_layers = hf.num_hidden_layers
        self.vocab_size = hf.vocab_size
        self.d_inner = getattr(hf, "intermediate_size", 2 * hf.hidden_size)
        self.d_state = getattr(hf, "state_size", 16)
        self.d_conv = getattr(hf, "conv_kernel", 4)
        self.dt_rank = getattr(hf, "time_step_rank", None)
        if self.dt_rank is None or self.dt_rank == "auto":
            self.dt_rank = -(-self.hidden_size // 16)
        self.use_conv_bias = getattr(hf, "use_conv_bias", True)
        self.use_bias = getattr(hf, "use_bias", False)
        self.rms_eps = getattr(hf, "layer_norm_epsilon", 1e-5)
        self.tie_embeddings = getattr(hf, "tie_word_embeddings", True)
        # FalconMamba: parameterless RMS over the dt/B/C selection outputs.
        self.bcdt_rms_eps = (getattr(hf, "mixer_rms_eps", 1e-6)
                             if hf.model_type == "falcon_mamba" else None)
        # Interface parity for generic worker sizing paths.
        self.num_kv_heads = 1
        self.head_dim = self.d_state
        self.sliding_window = None

    # ------------------------------------------------------------- state cache
    def init_cache(self, num_slots: int, cache_config=None, kv_dtype=None,
                   use_pallas: bool = False) -> dict:
        """Recurrent-state buffers (replaces the paged KV cache; the ssm
        state is f32 like the reference's selective-scan accumulator)."""
        L = self.num_layers
        return {
            "conv": jnp.zeros((L, num_slots, self.d_conv - 1, self.d_inner),
                              self.dtype),
            "ssm": jnp.zeros((L, num_slots, self.d_inner, self.d_state),
                             jnp.float32),
        }

    def cache_specs(self) -> dict:
        return {"conv": P(), "ssm": P()}

    # ------------------------------------------------------------------ params
    def _layer_shapes(self) -> dict[str, tuple]:
        H, Di, Ds, R = (self.hidden_size, self.d_inner, self.d_state,
                        self.dt_rank)
        L, K = self.num_layers, self.d_conv
        shapes = {
            "norm": (L, H),
            "in_proj": (L, H, 2 * Di),
            "conv_w": (L, K, Di),       # conv1d.weight [Di,1,K] -> [K,Di]
            "x_proj": (L, Di, R + 2 * Ds),
            "dt_w": (L, R, Di),
            "dt_b": (L, Di),
            "A_log": (L, Di, Ds),
            "D": (L, Di),
            "out_proj": (L, Di, H),
        }
        if self.use_conv_bias:
            shapes["conv_b"] = (L, Di)
        if self.use_bias:
            shapes["in_b"] = (L, 2 * Di)
            shapes["out_b"] = (L, H)
        return shapes

    def init_dummy_params(self, rng: jax.Array) -> dict:
        keys = iter(jax.random.split(rng, 32))

        def mk(shape, scale=0.02):
            return (scale * jax.random.normal(next(keys), shape,
                                              jnp.float32)
                    ).astype(self.dtype)
        layers = {}
        for name, shape in self._layer_shapes().items():
            if name == "norm":
                layers[name] = jnp.ones(shape, self.dtype)
            elif name == "A_log":
                layers[name] = jnp.log(jnp.broadcast_to(
                    jnp.arange(1, shape[-1] + 1, dtype=jnp.float32),
                    shape))
            elif name == "D":
                layers[name] = jnp.ones(shape, self.dtype)
            elif name.endswith("_b"):
                layers[name] = jnp.zeros(shape, self.dtype)
            else:
                layers[name] = mk(shape)
        params = {
            "embed": mk((self.vocab_size, self.hidden_size)),
            "layers": layers,
            "final_norm": jnp.ones((self.hidden_size,), self.dtype),
        }
        if not self.tie_embeddings:
            params["lm_head"] = mk((self.hidden_size, self.vocab_size))
        return params

    _HF_MAP = {
        "norm.weight": ("norm", False),
        "mixer.in_proj.weight": ("in_proj", True),
        "mixer.in_proj.bias": ("in_b", False),
        "mixer.conv1d.bias": ("conv_b", False),
        "mixer.x_proj.weight": ("x_proj", True),
        "mixer.dt_proj.weight": ("dt_w", True),
        "mixer.dt_proj.bias": ("dt_b", False),
        "mixer.D": ("D", False),
        "mixer.out_proj.weight": ("out_proj", True),
        "mixer.out_proj.bias": ("out_b", False),
    }

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        bufs = {k: np.zeros(s, np.float32 if k == "A_log" else target)
                for k, s in self._layer_shapes().items()}
        params: dict = {"layers": bufs}
        for name, w in weights:
            w = np.asarray(w)
            name = name.removeprefix("backbone.")
            if name == "embeddings.weight":
                params["embed"] = w.astype(target)
            elif name == "norm_f.weight":
                params["final_norm"] = w.astype(target)
            elif name == "lm_head.weight":
                if not self.tie_embeddings:
                    params["lm_head"] = w.T.astype(target)
            elif name.startswith("layers."):
                rest = name[len("layers."):]
                idx_s, sub = rest.split(".", 1)
                li = int(idx_s)
                if sub == "mixer.conv1d.weight":  # [Di, 1, K] -> [K, Di]
                    bufs["conv_w"][li] = w[:, 0, :].T.astype(target)
                elif sub == "mixer.A_log":
                    bufs["A_log"][li] = w.astype(np.float32)
                else:
                    m = self._HF_MAP.get(sub)
                    if m and m[0] in bufs:
                        key, tr = m
                        bufs[key][li] = (w.T if tr else w).astype(
                            bufs[key].dtype)
        if "embed" not in params:
            raise ValueError("checkpoint missing backbone.embeddings.weight")
        return params

    def param_specs(self) -> dict:
        # TP plan (follow-up): shard d_inner like the reference's column/row
        # split of in_proj/out_proj; replicated is correct everywhere.
        layers = {k: P() for k in self._layer_shapes()}
        specs = {"embed": P(), "layers": layers, "final_norm": P()}
        if not self.tie_embeddings:
            specs["lm_head"] = P()
        return specs

    # ----------------------------------------------------------------- forward
    def _mixer(self, x: jax.Array, lp: dict, cache, md: AttentionMetadata):
        """One mamba block over the flat ragged token layout.
        x: [T, H]; cache: (conv [S, K-1, Di], ssm [S, Di, Ds])."""
        conv_st, ssm_st = cache
        T = x.shape[0]
        Di, Ds, K = self.d_inner, self.d_state, self.d_conv
        t_idx = jnp.arange(T, dtype=jnp.int32)
        req = md.token_req_idx
        seg_start_t = md.seg_starts[req]            # [T]
        slot_t = md.state_slots[req]                # [T]
        valid = md.slot_mapping >= 0
        # Position of each segment's first token (0 = fresh start).
        pos0_t = md.token_pos[seg_start_t]

        proj = jnp.dot(x, lp["in_proj"],
                       preferred_element_type=jnp.float32).astype(x.dtype)
        if "in_b" in lp:
            proj = proj + lp["in_b"]
        h, gate = proj[:, :Di], proj[:, Di:]
        h = jnp.where(valid[:, None], h, 0.0)

        # Depthwise causal conv: K shifted taps; history taps before the
        # segment start read the conv state (only when resuming, pos0 > 0).
        acc = jnp.zeros((T, Di), jnp.float32)
        for s in range(K):
            tap_w = lp["conv_w"][K - 1 - s]  # weight for x[t-s]
            src_idx = jnp.maximum(t_idx - s, 0)
            from_seq = (t_idx - s) >= seg_start_t
            seq_val = jnp.take(h, src_idx, axis=0)
            if s == 0:
                tap = seq_val
            else:
                # Conv-state row for input position (pos_t - s): the state
                # holds the segment's preceding K-1 inputs, newest last.
                back = seg_start_t - (t_idx - s)      # >= 1 when from cache
                cache_row = jnp.clip(K - 1 - back, 0)
                cache_val = conv_st[slot_t, cache_row]
                use_cache = (~from_seq) & (back <= K - 1) & (pos0_t > 0)
                tap = jnp.where(from_seq[:, None], seq_val,
                                jnp.where(use_cache[:, None],
                                          cache_val.astype(seq_val.dtype),
                                          0.0))
            acc = acc + tap.astype(jnp.float32) * tap_w.astype(jnp.float32)
        if "conv_b" in lp:
            acc = acc + lp["conv_b"].astype(jnp.float32)
        hc = jax.nn.silu(acc).astype(x.dtype)
        hc = jnp.where(valid[:, None], hc, 0.0)

        # New conv state: the segment's last K-1 inputs (pre-activation h),
        # pulling from the old state when the segment is shorter than K-1.
        seg_ends = md.query_start_loc[1:]  # [R] (end row + 1 per segment)
        new_conv = []
        for j in range(K - 1, 0, -1):  # offsets K-1 .. 1 before segment end
            idx = seg_ends - 1 - (j - 1)
            from_seq_r = idx >= md.seg_starts
            seq_val = jnp.take(h, jnp.clip(idx, 0), axis=0)
            back = md.seg_starts - idx
            cache_row = jnp.clip(K - 1 - back, 0)
            pos0_r = md.token_pos[md.seg_starts]
            old_val = conv_st[md.state_slots, cache_row]
            use_old = (~from_seq_r) & (back <= K - 1) & (pos0_r > 0)
            new_conv.append(jnp.where(
                from_seq_r[:, None], seq_val,
                jnp.where(use_old[:, None], old_val.astype(seq_val.dtype),
                          0.0)))
        new_conv = jnp.stack(new_conv, axis=1)  # [R, K-1, Di]
        live = md.seq_lens > 0
        conv_st = conv_st.at[jnp.where(live, md.state_slots,
                                       conv_st.shape[0])].set(
            new_conv.astype(conv_st.dtype), mode="drop")

        # Selective scan (f32, matching the reference kernel's accumulator).
        ssm_p = jnp.dot(hc, lp["x_proj"],
                        preferred_element_type=jnp.float32)
        dt = ssm_p[:, :self.dt_rank]
        B = ssm_p[:, self.dt_rank:self.dt_rank + Ds]
        C = ssm_p[:, self.dt_rank + Ds:]
        if "dt_norm_w" in lp:
            # Jamba: learned RMSNorm over dt/B/C selection outputs.
            def _wrms(x, w):
                return x * jax.lax.rsqrt(
                    jnp.mean(x * x, -1, keepdims=True) + self.rms_eps) \
                    * w.astype(jnp.float32)
            dt = _wrms(dt, lp["dt_norm_w"])
            B = _wrms(B, lp["b_norm_w"])
            C = _wrms(C, lp["c_norm_w"])
        elif self.bcdt_rms_eps is not None:
            # FalconMamba: parameterless RMS over dt/B/C (reference:
            # falcon_mamba rms_forward on the selection outputs).
            def _rms(x):
                return x * jax.lax.rsqrt(
                    jnp.mean(x * x, -1, keepdims=True) + self.bcdt_rms_eps)
            dt, B, C = _rms(dt), _rms(B), _rms(C)
        dt = jax.nn.softplus(
            jnp.dot(dt.astype(x.dtype), lp["dt_w"],
                    preferred_element_type=jnp.float32)
            + lp["dt_b"].astype(jnp.float32))            # [T, Di]
        A = -jnp.exp(lp["A_log"])                        # [Di, Ds] f32
        dA = jnp.exp(dt[:, :, None] * A[None])           # [T, Di, Ds]
        dBx = dt[:, :, None] * B[:, None, :] * hc.astype(jnp.float32)[:, :, None]
        # Segment-isolation rewrite: first token of each segment applies its
        # decay to the slot's resumed state h0 and zeroes the carry.
        is_first = t_idx == seg_start_t
        h0 = ssm_st[slot_t]                              # [T, Di, Ds]
        h0 = jnp.where((pos0_t > 0)[:, None, None], h0, 0.0)
        dBx = jnp.where(is_first[:, None, None], dBx + dA * h0, dBx)
        dA = jnp.where((is_first | ~valid)[:, None, None], 0.0, dA)
        dBx = jnp.where(valid[:, None, None], dBx, 0.0)

        from aphrodite_tpu.ops.selective_scan import ssm_scan
        hs = ssm_scan(dA, dBx)

        y = jnp.einsum("tds,ts->td", hs, C)
        y = y + hc.astype(jnp.float32) * lp["D"].astype(jnp.float32)[None]
        y = (y * jax.nn.silu(gate.astype(jnp.float32))).astype(x.dtype)
        out = jnp.dot(y, lp["out_proj"],
                      preferred_element_type=jnp.float32).astype(x.dtype)
        if "out_b" in lp:
            out = out + lp["out_b"]

        # Persist each live request's final state (segment's last row).
        ends = jnp.clip(md.query_start_loc[1:] - 1, 0)
        final_h = jnp.take(hs, ends, axis=0)             # [R, Di, Ds]
        ssm_st = ssm_st.at[jnp.where(live, md.state_slots,
                                     ssm_st.shape[0])].set(
            final_h, mode="drop")
        return out, (conv_st, ssm_st)

    def apply(self, params: dict, input_ids: jax.Array, kv_cache: dict,
              md: AttentionMetadata, *, use_pallas: bool = False,
              lora: dict | None = None, mm=None):
        if lora is not None:
            raise NotImplementedError("LoRA on Mamba: follow-up")
        x = jnp.take(params["embed"], input_ids, axis=0)

        def layer(x, xs):
            lp, conv_l, ssm_l = xs
            h = rms_norm(x, lp["norm"], self.rms_eps)
            out, (conv_l, ssm_l) = self._mixer(h, lp, (conv_l, ssm_l), md)
            return x + out, (conv_l, ssm_l)

        x, (conv, ssm) = jax.lax.scan(
            layer, x, (params["layers"], kv_cache["conv"], kv_cache["ssm"]))
        x = rms_norm(x, params["final_norm"], self.rms_eps)
        return x, {"conv": conv, "ssm": ssm}

    def compute_logits(self, params: dict, hidden: jax.Array) -> jax.Array:
        head = params["embed"].T if self.tie_embeddings else params["lm_head"]
        return jnp.dot(hidden, head, preferred_element_type=jnp.float32)


class FalconMambaForCausalLM(MambaForCausalLM):
    """FalconMamba: mamba-1 with parameterless RMS over the dt/B/C
    selection outputs (bcdt_rms_eps set from config.mixer_rms_eps)."""


class Mamba2ForCausalLM(MambaForCausalLM):
    """Mamba-2 (SSD): multi-head scalar-decay state space.

    Parity: aphrodite's mamba2 family via kernels/mamba SSD kernels —
    re-expressed as the same ragged associative scan as mamba-1 (the SSD
    chunked algorithm is an equivalent factorization; the scan form needs
    no chunk bookkeeping and composes with the flat token layout). Per
    head the decay is a scalar exp(dt*A_h), the state is [head_dim x
    state], B/C come in n_groups shared across heads, and the output goes
    through a z-gated RMSNorm before out_proj.
    """

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.text_config
        self.d_inner = getattr(hf, "expand", 2) * hf.hidden_size
        self.d_state = hf.state_size
        self.d_conv = hf.conv_kernel
        self.n_heads = hf.num_heads
        self.head_dim_m2 = hf.head_dim
        self.n_groups = getattr(hf, "n_groups", 1)
        self.conv_dim = self.d_inner + 2 * self.n_groups * self.d_state
        self.dt_limit = tuple(getattr(hf, "time_step_limit", (0.0,
                                                              float("inf"))))
        self.rms_eps = getattr(hf, "layer_norm_epsilon", 1e-5)

    def init_cache(self, num_slots: int, cache_config=None, kv_dtype=None,
                   use_pallas: bool = False) -> dict:
        L = self.num_layers
        return {
            "conv": jnp.zeros((L, num_slots, self.d_conv - 1,
                               self.conv_dim), self.dtype),
            "ssm": jnp.zeros((L, num_slots, self.n_heads,
                              self.head_dim_m2, self.d_state), jnp.float32),
        }

    def _layer_shapes(self) -> dict[str, tuple]:
        H, Di, L = self.hidden_size, self.d_inner, self.num_layers
        nh, K = self.n_heads, self.d_conv
        return {
            "norm": (L, H),
            "in_proj": (L, H, Di + self.conv_dim + nh),
            "conv_w": (L, K, self.conv_dim),
            "conv_b": (L, self.conv_dim),
            "dt_bias": (L, nh),
            "A_log": (L, nh),
            "D": (L, nh),
            "gated_norm_w": (L, Di),
            "out_proj": (L, Di, H),
        }

    _HF_MAP = {
        "norm.weight": ("norm", False),
        "mixer.in_proj.weight": ("in_proj", True),
        "mixer.conv1d.bias": ("conv_b", False),
        "mixer.dt_bias": ("dt_bias", False),
        "mixer.D": ("D", False),
        "mixer.norm.weight": ("gated_norm_w", False),
        "mixer.out_proj.weight": ("out_proj", True),
    }

    def _mixer(self, x: jax.Array, lp: dict, cache, md: AttentionMetadata):
        conv_st, ssm_st = cache
        T = x.shape[0]
        Di, Ds, K = self.d_inner, self.d_state, self.d_conv
        nh, hd, G = self.n_heads, self.head_dim_m2, self.n_groups
        t_idx = jnp.arange(T, dtype=jnp.int32)
        req = md.token_req_idx
        seg_start_t = md.seg_starts[req]
        slot_t = md.state_slots[req]
        valid = md.slot_mapping >= 0
        pos0_t = md.token_pos[seg_start_t]

        proj = jnp.dot(x, lp["in_proj"],
                       preferred_element_type=jnp.float32).astype(x.dtype)
        gate = proj[:, :Di]
        xbc = jnp.where(valid[:, None], proj[:, Di:Di + self.conv_dim], 0.)
        dt_in = proj[:, Di + self.conv_dim:].astype(jnp.float32)  # [T, nh]

        # Depthwise causal conv over [x|B|C] with state taps (mamba-1
        # boundary logic, wider channel dim).
        acc = jnp.zeros((T, self.conv_dim), jnp.float32)
        for s in range(K):
            tap_w = lp["conv_w"][K - 1 - s]
            src_idx = jnp.maximum(t_idx - s, 0)
            from_seq = (t_idx - s) >= seg_start_t
            seq_val = jnp.take(xbc, src_idx, axis=0)
            if s == 0:
                tap = seq_val
            else:
                back = seg_start_t - (t_idx - s)
                cache_row = jnp.clip(K - 1 - back, 0)
                cache_val = conv_st[slot_t, cache_row]
                use_cache = (~from_seq) & (back <= K - 1) & (pos0_t > 0)
                tap = jnp.where(from_seq[:, None], seq_val,
                                jnp.where(use_cache[:, None],
                                          cache_val.astype(seq_val.dtype),
                                          0.0))
            acc = acc + tap.astype(jnp.float32) * tap_w.astype(jnp.float32)
        acc = acc + lp["conv_b"].astype(jnp.float32)
        xbc_c = jax.nn.silu(acc)
        xbc_c = jnp.where(valid[:, None], xbc_c, 0.0)
        h = xbc_c[:, :Di].reshape(T, nh, hd)
        B = xbc_c[:, Di:Di + G * Ds].reshape(T, G, Ds)
        C = xbc_c[:, Di + G * Ds:].reshape(T, G, Ds)
        rep = nh // G
        B = jnp.repeat(B, rep, axis=1)  # [T, nh, Ds]
        C = jnp.repeat(C, rep, axis=1)

        # New conv state rows (segment's last K-1 xbc inputs).
        seg_ends = md.query_start_loc[1:]
        new_conv = []
        for j in range(K - 1, 0, -1):
            idx = seg_ends - 1 - (j - 1)
            from_seq_r = idx >= md.seg_starts
            seq_val = jnp.take(xbc, jnp.clip(idx, 0), axis=0)
            back = md.seg_starts - idx
            cache_row = jnp.clip(K - 1 - back, 0)
            pos0_r = md.token_pos[md.seg_starts]
            old_val = conv_st[md.state_slots, cache_row]
            use_old = (~from_seq_r) & (back <= K - 1) & (pos0_r > 0)
            new_conv.append(jnp.where(
                from_seq_r[:, None], seq_val,
                jnp.where(use_old[:, None], old_val.astype(seq_val.dtype),
                          0.0)))
        new_conv = jnp.stack(new_conv, axis=1)
        live = md.seq_lens > 0
        conv_st = conv_st.at[jnp.where(live, md.state_slots,
                                       conv_st.shape[0])].set(
            new_conv.astype(conv_st.dtype), mode="drop")

        # Scalar-decay multihead scan.
        dt = jax.nn.softplus(dt_in + lp["dt_bias"].astype(jnp.float32))
        dt = jnp.clip(dt, self.dt_limit[0], self.dt_limit[1])  # [T, nh]
        A = -jnp.exp(lp["A_log"])                              # [nh]
        dA = jnp.exp(dt * A[None])[:, :, None, None]           # [T,nh,1,1]
        dBx = (dt[:, :, None] * B)[:, :, None, :] \
            * h.astype(jnp.float32)[:, :, :, None]             # [T,nh,hd,Ds]
        is_first = t_idx == seg_start_t
        h0 = ssm_st[slot_t]
        h0 = jnp.where((pos0_t > 0)[:, None, None, None], h0, 0.0)
        dBx = jnp.where(is_first[:, None, None, None], dBx + dA * h0, dBx)
        dA = jnp.where((is_first | ~valid)[:, None, None, None], 0.0, dA)
        dBx = jnp.where(valid[:, None, None, None], dBx, 0.0)

        from aphrodite_tpu.ops.selective_scan import ssm_scan
        hs = ssm_scan(jnp.broadcast_to(dA, dBx.shape), dBx)

        y = jnp.einsum("thds,ths->thd", hs, C)
        y = y + h.astype(jnp.float32) * lp["D"].astype(jnp.float32)[
            None, :, None]
        y = y.reshape(T, Di)
        # Gated RMSNorm (y * silu(z), then rms * w).
        y = y * jax.nn.silu(gate.astype(jnp.float32))
        y = y * jax.lax.rsqrt(jnp.mean(y * y, -1, keepdims=True)
                              + self.rms_eps)
        y = (y * lp["gated_norm_w"].astype(jnp.float32)).astype(x.dtype)
        out = jnp.dot(y, lp["out_proj"],
                      preferred_element_type=jnp.float32).astype(x.dtype)

        ends = jnp.clip(md.query_start_loc[1:] - 1, 0)
        final_h = jnp.take(hs, ends, axis=0)
        ssm_st = ssm_st.at[jnp.where(live, md.state_slots,
                                     ssm_st.shape[0])].set(
            final_h, mode="drop")
        return out, (conv_st, ssm_st)
