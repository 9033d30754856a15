"""BART encoder-decoder vs the HF oracle (text-to-text conditional
generation through the cross-attention encoder-cache path)."""
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from transformers import BartConfig, BartForConditionalGeneration
    cfg = BartConfig(
        vocab_size=256, d_model=64, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_position_embeddings=128, scale_embedding=True,
        activation_function="gelu", bos_token_id=0, eos_token_id=2,
        pad_token_id=1, decoder_start_token_id=2, forced_bos_token_id=0,
        forced_eos_token_id=None)
    torch.manual_seed(0)
    hf = BartForConditionalGeneration(cfg).eval()
    d = tmp_path_factory.mktemp("tiny_bart")
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf


def test_bart_matches_hf(ckpt):
    d, hf = ckpt
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(d), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=120, tokenizer="unused")
    encs = [[5, 9, 17, 3, 30, 2], [7, 8, 9, 10, 2]]
    decs = [[2, 0], [2, 0, 40]]
    outs = llm.generate(
        [{"encoder_prompt_token_ids": e, "prompt_token_ids": dcr}
         for e, dcr in zip(encs, decs)],
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))
    for e, dcr, o in zip(encs, decs, outs):
        with torch.no_grad():
            exp = hf.generate(
                input_ids=torch.tensor([e]),
                decoder_input_ids=torch.tensor([dcr]),
                max_new_tokens=8, do_sample=False, eos_token_id=None,
                forced_bos_token_id=None)
        assert o.outputs[0].token_ids == exp[0][len(dcr):].tolist()


def test_bart_default_decoder_start(ckpt):
    """Encoder-only prompts get [decoder_start, forced_bos] seeded."""
    d, hf = ckpt
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(d), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=120, tokenizer="unused")
    enc = [5, 9, 17, 3, 2]
    outs = llm.generate([{"encoder_prompt_token_ids": enc}],
                        SamplingParams(temperature=0.0, max_tokens=6,
                                       ignore_eos=True))
    with torch.no_grad():
        exp = hf.generate(input_ids=torch.tensor([enc]),
                          decoder_input_ids=torch.tensor([[2, 0]]),
                          max_new_tokens=6, do_sample=False,
                          eos_token_id=None, forced_bos_token_id=None)
    assert outs[0].outputs[0].token_ids == exp[0][2:].tolist()
