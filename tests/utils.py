"""Shared test helpers: tiny HF checkpoints and attention-metadata builders."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from aphrodite_tpu.attention.metadata import AttentionMetadata
from aphrodite_tpu.utils import cdiv


def tiny_llama_hf_config(vocab_size=256, hidden=64, layers=2, heads=4,
                         kv_heads=2, intermediate=128, max_pos=512, **kw):
    from transformers import LlamaConfig
    return LlamaConfig(
        vocab_size=vocab_size, hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, num_key_value_heads=kv_heads,
        intermediate_size=intermediate, max_position_embeddings=max_pos,
        rms_norm_eps=1e-6, tie_word_embeddings=False, **kw)


def save_tiny_hf_checkpoint(tmpdir, hf_config, seed=0):
    """Randomly-initialized HF model saved as safetensors; returns the torch
    model (the oracle) and the checkpoint dir."""
    import torch
    from transformers import AutoModelForCausalLM
    torch.manual_seed(seed)
    model = AutoModelForCausalLM.from_config(hf_config)
    model = model.eval().to(torch.float32)
    model.save_pretrained(tmpdir, safe_serialization=True)
    return model


def make_prefill_metadata(prompts: list[list[int]], block_size: int,
                          max_pages_per_req: int, num_tokens_pad: int = None,
                          num_reqs_pad: int = None):
    """AttentionMetadata for a fresh full-prefill batch with sequentially
    allocated pages (page 0 reserved as null). Returns (md, input_ids)."""
    n_reqs = len(prompts)
    num_reqs_pad = num_reqs_pad or n_reqs
    total = sum(len(p) for p in prompts)
    num_tokens_pad = num_tokens_pad or total

    token_req, token_pos, slots, ids = [], [], [], []
    block_tables = np.zeros((num_reqs_pad, max_pages_per_req), np.int32)
    seq_lens = np.zeros((num_reqs_pad,), np.int32)
    qsl = np.zeros((num_reqs_pad + 1,), np.int32)
    next_page = 1
    for r, p in enumerate(prompts):
        n_pages = cdiv(len(p), block_size)
        pages = list(range(next_page, next_page + n_pages))
        next_page += n_pages
        block_tables[r, :n_pages] = pages
        seq_lens[r] = len(p)
        qsl[r + 1] = qsl[r] + len(p)
        for i, tok in enumerate(p):
            token_req.append(r)
            token_pos.append(i)
            slots.append(pages[i // block_size] * block_size + i % block_size)
            ids.append(tok)
    while len(ids) < num_tokens_pad:
        token_req.append(0)
        token_pos.append(0)
        slots.append(-1)
        ids.append(0)
    qsl[n_reqs + 1:] = qsl[n_reqs]

    md = AttentionMetadata(
        token_req_idx=jnp.asarray(token_req, jnp.int32),
        token_pos=jnp.asarray(token_pos, jnp.int32),
        slot_mapping=jnp.asarray(slots, jnp.int32),
        query_start_loc=jnp.asarray(qsl, jnp.int32),
        seq_lens=jnp.asarray(seq_lens, jnp.int32),
        block_tables=jnp.asarray(block_tables, jnp.int32),
        num_reqs=jnp.asarray(n_reqs, jnp.int32),
        num_tokens=jnp.asarray(total, jnp.int32),
    )
    return md, jnp.asarray(ids, jnp.int32), next_page


def build_tiny_tokenizer(save_dir, vocab_size=256):
    """Train a tiny byte-level BPE in-process (no network) and save it so
    AutoTokenizer.from_pretrained(save_dir) works."""
    from tokenizers import (Tokenizer, decoders, models, pre_tokenizers,
                            trainers)
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size,
        special_tokens=["<unk>", "<s>", "</s>"])
    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "hello world, this is a test of the tokenizer",
        "paged attention over block tables on tpu hardware",
        "0123456789 !@#$%^&*()",
    ] * 8
    tok.train_from_iterator(corpus, trainer)
    from transformers import PreTrainedTokenizerFast
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>")
    fast.chat_template = (
        "{% for m in messages %}{{ m['role'] }}: {{ m['content'] }}\n"
        "{% endfor %}{% if add_generation_prompt %}assistant:{% endif %}")
    fast.save_pretrained(str(save_dir))
    return fast


class RemoteOpenAIServer:
    """Spawn the real server as a subprocess and wait for /health
    (reference pattern: tests/utils.py:65 RemoteOpenAIServer)."""

    def __init__(self, model_path, extra_args=(), port=None, timeout=180.0):
        import os
        import socket
        import subprocess
        import sys
        import time

        import httpx

        if port is None:
            with socket.socket() as s:
                s.bind(("127.0.0.1", 0))
                port = s.getsockname()[1]
        self.port = port
        self.base_url = f"http://127.0.0.1:{port}"
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))) + ":" + env.get("PYTHONPATH", ""))
        self.proc = subprocess.Popen(
            [sys.executable, "-m", "aphrodite_tpu.cli", "run",
             str(model_path), "--host", "127.0.0.1", "--port", str(port),
             "--device", "cpu", *extra_args],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        deadline = time.time() + timeout
        while time.time() < deadline:
            if self.proc.poll() is not None:
                out = self.proc.stdout.read().decode(errors="replace")
                raise RuntimeError(f"server died:\n{out[-4000:]}")
            try:
                r = httpx.get(self.base_url + "/health", timeout=2)
                if r.status_code == 200:
                    return
            except Exception:
                pass
            time.sleep(0.5)
        self.kill()
        raise TimeoutError("server did not become healthy")

    def kill(self):
        if self.proc.poll() is None:
            self.proc.terminate()
            try:
                self.proc.wait(10)
            except Exception:
                self.proc.kill()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.kill()
