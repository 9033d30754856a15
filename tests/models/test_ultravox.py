"""Ultravox (remote-code) vs a composed oracle: HF Whisper encoder +
hand torch projector (stack/RMS/MulAndSilu) + HF llama on scattered
embeddings."""
import json

import numpy as np
import torch
import torch.nn.functional as F

from aphrodite_tpu.sampling_params import SamplingParams
from tests.models.test_remote_variants import _save

AUD = 250


def test_ultravox_matches_composed_oracle(tmp_path):
    from transformers import (LlamaConfig, AutoModelForCausalLM,
                              WhisperConfig, WhisperModel)
    torch.manual_seed(0)
    wcfg = WhisperConfig(d_model=32, encoder_layers=2,
                         encoder_attention_heads=2, encoder_ffn_dim=64,
                         num_mel_bins=16, max_source_positions=20,
                         vocab_size=64, decoder_layers=1,
                         decoder_attention_heads=2, decoder_ffn_dim=64,
                         max_target_positions=32, pad_token_id=0,
                         bos_token_id=1, eos_token_id=2,
                         decoder_start_token_id=1)
    whisper = WhisperModel(wcfg).eval()
    enc = whisper.encoder
    lcfg = LlamaConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2, max_position_embeddings=512,
                       bos_token_id=1, eos_token_id=2)
    llama = AutoModelForCausalLM.from_config(lcfg).eval()

    SF, PH, D_A, D_T = 4, 48, 32, 64
    din, mid = D_A * SF, PH // 2
    proj = {"ln_pre": torch.ones(din) + 0.1 * torch.randn(din),
            "w1": torch.randn(PH, din) * 0.05,
            "w2": torch.randn(D_T, mid) * 0.05,
            "ln_post": torch.ones(D_T) + 0.1 * torch.randn(D_T)}

    # ---- checkpoint under Ultravox naming -------------------------------
    out = {}
    for n, w in enc.state_dict().items():
        out["audio_tower." + n] = w
    out["multi_modal_projector.ln_pre.weight"] = proj["ln_pre"]
    out["multi_modal_projector.linear_1.weight"] = proj["w1"]
    out["multi_modal_projector.linear_2.weight"] = proj["w2"]
    out["multi_modal_projector.ln_post.weight"] = proj["ln_post"]
    for n, w in llama.state_dict().items():
        out["language_model." + n] = w
    _save(tmp_path, out, {
        "architectures": ["UltravoxModel"], "model_type": "ultravox",
        "audio_config": {k: v for k, v in wcfg.to_dict().items()
                         if not k.startswith("_")},
        "text_config": {k: v for k, v in lcfg.to_dict().items()
                        if not k.startswith("_")},
        "stack_factor": SF, "projector_act": "swiglu",
        "projector_ln_mid": False, "hidden_size": PH,
        "audio_token_index": AUD,
        "bos_token_id": 1, "eos_token_id": 2})

    # ---- oracle ---------------------------------------------------------
    frames = 40
    rng = np.random.RandomState(0)
    feats = rng.randn(1, 16, frames).astype(np.float32)

    def rms(x, w):
        return x * torch.rsqrt((x.float() ** 2).mean(-1, keepdim=True)
                               + 1e-6) * w

    with torch.no_grad():
        h = enc(torch.tensor(feats)).last_hidden_state  # [1, 20, 32]
        T = h.shape[1]
        T_pad = (T + SF - 1) // SF * SF
        h = F.pad(h, (0, 0, 0, T_pad - T)).view(1, T_pad // SF, din)
        h = rms(h, proj["ln_pre"])
        h = h @ proj["w1"].T
        h = h[..., :mid] * F.silu(h[..., mid:])
        h = h @ proj["w2"].T
        audio_embeds = rms(h, proj["ln_post"])[0]  # [5, 64]
    n_tok = audio_embeds.shape[0]
    assert n_tok == 5
    prompt = [1, 7] + [AUD] * n_tok + [5, 9, 20]

    def oracle(n_new):
        emb = llama.model.embed_tokens(torch.tensor([prompt]))
        emb[0, 2:2 + n_tok] = audio_embeds.to(emb.dtype)
        with torch.no_grad():
            out = llama.generate(inputs_embeds=emb, max_new_tokens=n_new,
                                 do_sample=False, eos_token_id=None)
        return out[0].tolist()[-n_new:] if out.shape[1] == n_new else \
            out[0][len(prompt):].tolist()

    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=128, max_num_seqs=4,
              max_model_len=256, tokenizer="unused")
    fam = np.ones((1, frames), np.int64)
    outs = llm.generate(
        [{"prompt_token_ids": prompt,
          "multi_modal_data": {"audio": {"input_features": feats,
                                         "feature_attention_mask": fam}}}],
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))
    assert outs[0].outputs[0].token_ids == oracle(8)
