"""llama_variants vs HF oracles: StableLM, Starcoder2, Phi, GPT-J,
GPT-BigCode (MQA), Persimmon, Cohere (Command-R), OLMo, OLMo-2, Granite,
Nemotron — each exercises a distinct decoder mechanism (see module
docstring of aphrodite_tpu/models/llama_variants.py)."""
import torch

from aphrodite_tpu.sampling_params import SamplingParams


def _check(tmp_path, cfg, n_new=8):
    from transformers import AutoModelForCausalLM
    torch.manual_seed(0)
    try:
        hf = AutoModelForCausalLM.from_config(cfg).eval()
    except AttributeError:
        # HF's _init_weights trips over bias-free LayerNorms (e.g. StableLM
        # qk_layernorm); build uninitialized and randomize by hand.
        from transformers.modeling_utils import no_init_weights
        with no_init_weights():
            hf = AutoModelForCausalLM.from_config(cfg).eval()
        for name, p in hf.named_parameters():
            with torch.no_grad():
                if p.dim() > 1:
                    p.normal_(0.0, 0.02)
                elif name.endswith("bias"):
                    p.zero_()
                elif "norm" in name.lower():
                    p.fill_(1.0)
                else:
                    p.normal_(0.0, 0.02)
    hf.save_pretrained(tmp_path, safe_serialization=True)
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=256, tokenizer="unused")
    prompts = [[1, 5, 9, 20, 3], [7, 8, 9, 10, 11, 12]]
    outs = llm.generate(prompts, SamplingParams(temperature=0.0,
                                                max_tokens=n_new,
                                                ignore_eos=True))
    for p, out in zip(prompts, outs):
        with torch.no_grad():
            exp = hf.generate(torch.tensor([p]), max_new_tokens=n_new,
                              do_sample=False,
                              eos_token_id=None)[0][len(p):].tolist()
        assert out.outputs[0].token_ids == exp, p


def test_stablelm(tmp_path):
    from transformers import StableLmConfig
    _check(tmp_path, StableLmConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        partial_rotary_factor=0.25, use_qkv_bias=True,
        max_position_embeddings=512, bos_token_id=1, eos_token_id=2))


def test_stablelm_parallel_qknorm(tmp_path):
    from transformers import StableLmConfig
    _check(tmp_path, StableLmConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        partial_rotary_factor=1.0, use_parallel_residual=True,
        qk_layernorm=True, max_position_embeddings=512,
        bos_token_id=1, eos_token_id=2))


def test_starcoder2(tmp_path):
    from transformers import Starcoder2Config
    _check(tmp_path, Starcoder2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        use_bias=True, max_position_embeddings=512,
        bos_token_id=1, eos_token_id=2))


def test_phi(tmp_path):
    from transformers import PhiConfig
    _check(tmp_path, PhiConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        partial_rotary_factor=0.5, max_position_embeddings=512,
        bos_token_id=1, eos_token_id=2))


def test_gptj(tmp_path):
    from transformers import GPTJConfig
    _check(tmp_path, GPTJConfig(
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, rotary_dim=8,
        n_positions=512, bos_token_id=1, eos_token_id=2))


def test_gpt_bigcode_mqa(tmp_path):
    from transformers import GPTBigCodeConfig
    _check(tmp_path, GPTBigCodeConfig(
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, n_positions=512,
        multi_query=True, bos_token_id=1, eos_token_id=2))


def test_persimmon(tmp_path):
    from transformers import PersimmonConfig
    _check(tmp_path, PersimmonConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        partial_rotary_factor=0.5, qk_layernorm=True,
        max_position_embeddings=512, bos_token_id=1, eos_token_id=2))


def test_cohere(tmp_path):
    from transformers import CohereConfig
    _check(tmp_path, CohereConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        logit_scale=0.25, use_qk_norm=True, max_position_embeddings=512,
        bos_token_id=1, eos_token_id=2))


def test_olmo(tmp_path):
    from transformers import OlmoConfig
    _check(tmp_path, OlmoConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, clip_qkv=8.0,
        max_position_embeddings=512, pad_token_id=0, bos_token_id=1,
        eos_token_id=2))


def test_olmo2(tmp_path):
    from transformers import Olmo2Config
    _check(tmp_path, Olmo2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, pad_token_id=0, bos_token_id=1,
        eos_token_id=2))


def test_granite(tmp_path):
    from transformers import GraniteConfig
    _check(tmp_path, GraniteConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        embedding_multiplier=6.0, residual_multiplier=0.5,
        attention_multiplier=0.1, logits_scaling=4.0,
        max_position_embeddings=512, bos_token_id=1, eos_token_id=2))


def test_nemotron(tmp_path):
    from transformers import NemotronConfig
    _check(tmp_path, NemotronConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        partial_rotary_factor=0.5, max_position_embeddings=512,
        bos_token_id=1, eos_token_id=2))
