"""Mamba (selective SSM) vs HF oracle.

Covers: the ragged associative-scan recurrence, depthwise causal conv with
state taps, recurrent-state slots across decode steps, chunk-resume
(chunked prefill through the conv/ssm state path), and mixed batches."""
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams


def tiny_mamba_cfg(**kw):
    from transformers import MambaConfig
    base = dict(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                state_size=8, conv_kernel=4, intermediate_size=128,
                time_step_rank=8, use_conv_bias=True, use_bias=False,
                bos_token_id=1, eos_token_id=2, pad_token_id=0)
    base.update(kw)
    return MambaConfig(**base)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from transformers import MambaForCausalLM
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("tiny_mamba")
    hf = MambaForCausalLM(tiny_mamba_cfg()).eval()
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf


def _generate(d, prompts, n_new=8, chunk=64):
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(d), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=chunk,
              max_num_seqs=4, max_model_len=256, tokenizer="unused")
    outs = llm.generate(prompts, SamplingParams(temperature=0.0,
                                                max_tokens=n_new,
                                                ignore_eos=True))
    return [o.outputs[0].token_ids for o in outs]


def _hf(hf, p, n_new=8):
    with torch.no_grad():
        return hf.generate(torch.tensor([p]), max_new_tokens=n_new,
                           do_sample=False,
                           eos_token_id=None)[0][len(p):].tolist()


def test_mamba_matches_hf(ckpt):
    d, hf = ckpt
    prompts = [[1, 5, 9, 20, 3], [7, 8, 9, 10, 11, 12], [100, 101]]
    outs = _generate(d, prompts)
    for p, out in zip(prompts, outs):
        assert out == _hf(hf, p), p


def test_mamba_chunked_prefill(ckpt):
    """Chunk seams exercise conv-state taps + ssm h0 injection."""
    d, hf = ckpt
    prompts = [list(range(30, 69)), list(range(100, 131))]
    outs = _generate(d, prompts, n_new=6, chunk=16)
    for p, out in zip(prompts, outs):
        assert out == _hf(hf, p, 6), len(p)


def test_falcon_mamba_matches_hf(tmp_path):
    """FalconMamba: parameterless RMS over dt/B/C selection outputs."""
    from transformers import FalconMambaConfig, FalconMambaForCausalLM
    torch.manual_seed(0)
    cfg = FalconMambaConfig(vocab_size=256, hidden_size=64,
                            num_hidden_layers=2, state_size=8,
                            conv_kernel=4, intermediate_size=128,
                            time_step_rank=8, mixer_rms_eps=1e-6,
                            bos_token_id=1, eos_token_id=2, pad_token_id=0)
    hf = FalconMambaForCausalLM(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    prompts = [[1, 5, 9, 20, 3], [7, 8, 9, 10, 11, 12]]
    outs = _generate(tmp_path, prompts)
    for p, out in zip(prompts, outs):
        assert out == _hf(hf, p), p


def test_mamba2_matches_hf(tmp_path):
    """Mamba-2 (SSD): multi-head scalar decay, grouped B/C, gated norm."""
    from transformers import Mamba2Config, Mamba2ForCausalLM
    torch.manual_seed(0)
    cfg = Mamba2Config(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                       state_size=8, conv_kernel=4, expand=2, head_dim=16,
                       num_heads=8, n_groups=2, chunk_size=16,
                       bos_token_id=1, eos_token_id=2, pad_token_id=0)
    hf = Mamba2ForCausalLM(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    prompts = [[1, 5, 9, 20, 3], [7, 8, 9, 10, 11, 12]]
    outs = _generate(tmp_path, prompts)
    for p, out in zip(prompts, outs):
        assert out == _hf(hf, p), p


def test_mamba2_chunked_prefill(tmp_path):
    from transformers import Mamba2Config, Mamba2ForCausalLM
    torch.manual_seed(1)
    cfg = Mamba2Config(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                       state_size=8, conv_kernel=4, expand=2, head_dim=16,
                       num_heads=8, n_groups=2, chunk_size=16,
                       bos_token_id=1, eos_token_id=2, pad_token_id=0)
    hf = Mamba2ForCausalLM(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    prompts = [list(range(30, 69))]
    outs = _generate(tmp_path, prompts, n_new=6, chunk=16)
    assert outs[0] == _hf(hf, prompts[0], 6)


def test_mamba_multi_step_decode_equivalence(ckpt):
    """SSM decode now runs in-graph multi-step windows (round-4): token
    streams must match the single-step path exactly, including ragged
    decode budgets and mid-run joins."""
    from aphrodite_tpu.entrypoints.llm import LLM

    d, hf = ckpt
    prompts = [[1, 5, 9, 20, 3], [7, 8, 9, 10, 11, 12], [100, 101]]
    params = [SamplingParams(temperature=0.0, max_tokens=n, ignore_eos=True)
              for n in (12, 5, 9)]  # ragged budgets exercise step freezing

    def run(multi_step):
        llm = LLM(model=str(d), dtype="float32", block_size=16,
                  num_kv_blocks=128, max_num_batched_tokens=64,
                  max_num_seqs=4, max_model_len=256, tokenizer="unused",
                  multi_step_decode=multi_step)
        runner = llm.engine.core.worker.runner
        outs = llm.generate(prompts, params)
        return [o.outputs[0].token_ids for o in outs], runner

    multi, runner = run(16)
    single, _ = run(1)
    assert multi == single
    for p, out, pr in zip(prompts, multi, params):
        assert out == _hf(hf, p, pr.max_tokens), p
