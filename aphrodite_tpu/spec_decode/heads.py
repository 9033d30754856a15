"""Head-based speculative proposers: Medusa and MLPSpeculator.

Parity: aphrodite/modeling/models/medusa.py (ResidualBlock heads, weight
names ``medusa_heads.blocks.{i}.layers.{j}`` / ``lm_heads.{i}``) and
aphrodite/modeling/models/mlp_speculator.py (IBM combined token/embedding
speculator: per-step emb+proj+RMS-LN(+bias) recurrence, tie_weights,
scale_input), driven through v0's SpecDecodeWorker proposer slot
(aphrodite/spec_decode/{medusa_worker.py,mlp_speculator_worker.py}).

TPU design: both are pure functions of the target's last accepted hidden
state, so they need no KV ingest — one tiny jitted call per engine step
proposes k greedy tokens per request; sample-and-match verification in the
runner keeps greedy outputs exact regardless of head quality.
"""
from __future__ import annotations

import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from aphrodite_tpu.utils import logger


def _load_head_checkpoint(path: str) -> tuple[dict, dict[str, np.ndarray]]:
    """Head checkpoints (medusa / mlp_speculator dirs) have non-HF
    model_types, so read config.json + tensors directly."""
    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)
    from aphrodite_tpu.loader.weights import weights_iterator
    return cfg, {name: np.asarray(w) for name, w in weights_iterator(path)}


def rms_bias_norm(x, w, b, eps=1e-6):
    """MLPSpeculatorLayerNorm: RMS normalize, then scale and shift
    (reference mlp_speculator.py:47-55)."""
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
    if w is None:
        return xf.astype(x.dtype)
    return (xf * w + b).astype(x.dtype)


class _HeadProposerBase:
    """Common runner-lockstep plumbing (same interface as EagleProposer)."""

    needs_hidden = True

    def __init__(self, config, runner) -> None:
        self.runner = runner
        self.k = config.speculative_config.num_speculative_tokens
        self.max_model_len = config.scheduler_config.max_model_len
        self.pending_drafts: dict[str, list[int]] = {}

    def ingest_only(self, input_ids, md, hidden=None, **ctx) -> None:
        self.pending_drafts = {}

    def observe_and_propose(self, order, R_pad, input_ids, md,
                            samples_expected, hidden=None, host_qsl=None,
                            host_seg_starts=None, **ctx) -> None:
        requests = self.runner.requests
        rows = np.zeros((R_pad,), np.int32)
        last_tok = np.zeros((R_pad,), np.int32)
        active = []
        for r, rid in enumerate(order):
            st = requests[rid]
            if not samples_expected[r] or \
                    st.num_tokens + self.k + 1 > self.max_model_len:
                continue
            # Row that *sampled* the last accepted token: its hidden is what
            # the heads condition on (they predict the tokens after it).
            rows[r] = host_seg_starts[r] + st.num_tokens - 2 - st.num_computed
            last_tok[r] = st.token_ids[-1]
            active.append(r)
        self.pending_drafts = {}
        if not active:
            return
        toks = np.asarray(self._propose_fn(
            self.params, hidden, jnp.asarray(rows), jnp.asarray(last_tok)))
        for r in active:
            self.pending_drafts[order[r]] = [int(t) for t in toks[r]]


class MedusaProposer(_HeadProposerBase):
    """k independent residual-MLP heads over the last hidden state."""

    def __init__(self, config, runner, head_dir: str) -> None:
        super().__init__(config, runner)
        cfg, tensors = _load_head_checkpoint(head_dir)
        self.num_heads = cfg.get("medusa_num_heads", cfg.get("num_heads"))
        self.num_layers = cfg.get("medusa_num_layers",
                                  cfg.get("num_hidden_layers", 1))
        if self.k > self.num_heads:
            raise ValueError(f"requested k={self.k} speculative tokens but "
                             f"the Medusa checkpoint has {self.num_heads} "
                             "heads")
        H = cfg["hidden_size"]
        V = cfg["vocab_size"]
        dtype = runner.model.dtype
        k, L = self.num_heads, self.num_layers
        blocks_w = np.zeros((k, L, H, H), np.float32)
        blocks_b = np.zeros((k, L, H), np.float32)
        heads_w = np.zeros((k, H, V), np.float32)
        has_bias = False
        for name, w in tensors.items():
            name = name.replace("medusa_heads.", "")
            parts = name.split(".")
            if parts[0] == "blocks":
                i, j = int(parts[1]), int(parts[3])
                if parts[-1] == "weight":
                    blocks_w[i, j] = w.T
                else:
                    blocks_b[i, j] = w
                    has_bias = True
            elif parts[0] == "lm_heads" and parts[-1] == "weight":
                heads_w[int(parts[1])] = w.T
        self.params = {
            "blocks_w": jnp.asarray(blocks_w, dtype),
            "blocks_b": jnp.asarray(blocks_b, dtype) if has_bias else None,
            "heads_w": jnp.asarray(heads_w, dtype),
        }
        self._propose_fn = jax.jit(self._propose)
        logger.info("Medusa heads: %d x %d-layer (k=%d)", k, L, self.k)

    def _propose(self, params, hidden, rows, last_tok):
        h = jnp.take(hidden, rows, axis=0)  # [R, H]

        def head(_, xs):
            bw, bb, hw = xs  # [L,H,H], [L,H], [H,V]
            x = h

            def block(x, ys):
                w, b = ys
                y = jnp.dot(x, w, preferred_element_type=jnp.float32
                            ).astype(x.dtype)
                if params["blocks_b"] is not None:
                    y = y + b
                return x + jax.nn.silu(y), None
            x, _ = jax.lax.scan(block, x, (bw, bb))
            logits = jnp.dot(x, hw, preferred_element_type=jnp.float32)
            return None, jnp.argmax(logits, -1).astype(jnp.int32)

        bb = params["blocks_b"]
        if bb is None:
            bb = jnp.zeros(params["blocks_w"].shape[:3],
                           params["blocks_w"].dtype)
        _, toks = jax.lax.scan(
            head, None, (params["blocks_w"][:self.k], bb[:self.k],
                         params["heads_w"][:self.k]))
        return toks.T  # [R, k]


class MLPSpeculatorProposer(_HeadProposerBase):
    """Recurrent token+embedding speculator (arXiv:2404.19124)."""

    def __init__(self, config, runner, head_dir: str) -> None:
        super().__init__(config, runner)
        cfg, tensors = _load_head_checkpoint(head_dir)
        self.n_predict = cfg["n_predict"]
        if self.k > self.n_predict:
            raise ValueError(f"k={self.k} > n_predict={self.n_predict}")
        self.emb_dim = cfg["emb_dim"]
        self.inner_dim = cfg.get("inner_dim", 0) or cfg["emb_dim"]
        self.tie_weights = cfg.get("tie_weights", False)
        self.scale_input = cfg.get("scale_input", False)
        self.state_weight = 0.5 ** (0.5 / self.n_predict)
        self.emb_weight = math.sqrt(
            (1 - self.state_weight ** 2) * (self.inner_dim / 2))
        dtype = runner.model.dtype

        def get(name):
            w = tensors.get(name)
            return None if w is None else jnp.asarray(
                np.asarray(w, np.float32), dtype)

        n = 1 if self.tie_weights else self.n_predict
        self.params = {
            "emb": [get(f"emb.{i}.weight") for i in range(n)],
            "proj": [get(f"proj.{i}.weight").T for i in range(min(
                2 if self.tie_weights else self.n_predict, self.n_predict))],
            "head": [get(f"head.{i}.weight").T for i in range(n)],
            "ln_w": [get(f"ln.{i}.weight") for i in range(n)],
            "ln_b": [get(f"ln.{i}.bias") for i in range(n)],
        }
        self._propose_fn = jax.jit(self._propose)
        logger.info("MLPSpeculator: n_predict=%d inner=%d tied=%s (k=%d)",
                    self.n_predict, self.inner_dim, self.tie_weights, self.k)

    def _pick(self, key, i):
        lst = self.params[key]
        return lst[min(i, len(lst) - 1)]

    def _propose(self, params, hidden, rows, last_tok):
        prev = jnp.take(hidden, rows, axis=0)  # [R, emb_dim]
        if self.scale_input:
            prev = rms_bias_norm(prev, None, None) / math.sqrt(2)
        tok = last_tok
        outs = []
        alpha = self.emb_weight / self.state_weight
        for i in range(self.k):
            z = jnp.take(self._pick("emb", i), tok, axis=0)
            states = jnp.dot(prev, self._pick("proj", i),
                             preferred_element_type=jnp.float32
                             ).astype(prev.dtype)
            states = states + alpha * z
            states = jax.nn.gelu(
                rms_bias_norm(states, self._pick("ln_w", i),
                              self._pick("ln_b", i)), approximate=False)
            prev = states
            logits = jnp.dot(states, self._pick("head", i),
                             preferred_element_type=jnp.float32)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            outs.append(tok)
        return jnp.stack(outs, axis=1)  # [R, k]
