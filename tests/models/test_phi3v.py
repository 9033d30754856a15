"""Phi-3-Vision HD transform vs a torch oracle (HF CLIP tower + reference
hd_feature_transform math + HF Phi3 with inputs_embeds)."""
import json

import numpy as np
import torch
import torch.nn.functional as F

from aphrodite_tpu.sampling_params import SamplingParams

IMG = 250
S, PS = 16, 4  # tile size, vit patch -> g=4, g2=2
DV = 32


def _vit_cfg():
    from transformers import CLIPVisionConfig
    return CLIPVisionConfig(hidden_size=DV, num_hidden_layers=2,
                            num_attention_heads=2, intermediate_size=64,
                            image_size=S, patch_size=PS)


def _phi3_cfg():
    from transformers import Phi3Config
    return Phi3Config(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      intermediate_size=128, max_position_embeddings=512,
                      tie_word_embeddings=False, pad_token_id=0,
                      bos_token_id=1, eos_token_id=2)


def _merge_2x2(feats, hc, wc):
    """Reference reshape_hd_patches_2x2merge (torch)."""
    N, L, C = feats.shape
    H = int(L ** 0.5)
    x = feats.reshape(N, H, H, C) \
        .reshape(N, H // 2, 2, H // 2, 2, C) \
        .permute(0, 1, 3, 2, 4, 5) \
        .reshape(N, -1, 4 * C) \
        .reshape(N // (hc * wc), hc, wc, H // 2, H // 2, -1) \
        .permute(0, 1, 3, 2, 4, 5) \
        .reshape(N // (hc * wc), hc * H // 2, wc * H // 2, 4 * C)
    return x


def _newline(x, sub_gn):
    n, h, w, d = x.shape
    nl = sub_gn.expand(n, h, -1, -1)
    return torch.cat([x, nl], dim=2).reshape(n, -1, d)


def test_phi3v_matches_torch_oracle(tmp_path):
    from transformers import AutoModelForCausalLM, CLIPVisionModel
    torch.manual_seed(0)
    vit = CLIPVisionModel(_vit_cfg()).eval()
    lm = AutoModelForCausalLM.from_config(_phi3_cfg()).eval()
    glb_gn = torch.randn(1, 1, 4 * DV) * 0.05
    sub_gn = torch.randn(1, 1, 1, 4 * DV) * 0.05
    w1, b1 = torch.randn(64, 4 * DV) * 0.05, torch.randn(64) * 0.05
    w2, b2 = torch.randn(64, 64) * 0.05, torch.randn(64) * 0.05

    tensors = {}
    for k, v in vit.state_dict().items():
        # CLIPVisionModel keys already start with "vision_model."
        tensors["model.vision_embed_tokens.img_processor." + k] = v
    tensors["model.vision_embed_tokens.glb_GN"] = glb_gn
    tensors["model.vision_embed_tokens.sub_GN"] = sub_gn
    tensors["model.vision_embed_tokens.img_projection.0.weight"] = w1
    tensors["model.vision_embed_tokens.img_projection.0.bias"] = b1
    tensors["model.vision_embed_tokens.img_projection.2.weight"] = w2
    tensors["model.vision_embed_tokens.img_projection.2.bias"] = b2
    for k, v in lm.state_dict().items():
        tensors[k] = v
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v.detach().numpy())
               for k, v in tensors.items()},
              str(tmp_path / "model.safetensors"))
    cfg = _phi3_cfg().to_dict()
    cfg.update({
        "architectures": ["Phi3VForCausalLM"], "model_type": "phi3_v",
        "img_processor": {"layer_idx": -2, "image_dim_out": DV,
                          "vit_config": _vit_cfg().to_dict()},
        "embd_layer": {"use_hd_transform": True,
                       "with_learnable_separator": True,
                       "hd_transform_order": "sub_glb"},
        "num_crops": 4, "image_token_id": IMG,
        "torch_dtype": "float32"})
    (tmp_path / "config.json").write_text(json.dumps(cfg))

    from PIL import Image
    from aphrodite_tpu.config import ModelConfig
    from aphrodite_tpu.multimodal import Phi3VAdapter
    rng = np.random.RandomState(0)
    pil = Image.fromarray(rng.randint(0, 255, (20, 36, 3), np.uint8))
    mc = ModelConfig(model=str(tmp_path), dtype="float32")
    adapter = Phi3VAdapter(mc.hf_config)
    base = [1, 7, -1, 9, 20, 3]  # negative placeholder id form
    pv, expanded, spans, extra = adapter.process(pil, base)
    (hc, wc), = extra["crops"]
    assert (hc, wc) == (2, 2)

    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=128, max_num_seqs=4,
              max_model_len=256, tokenizer="unused")
    outs = llm.generate(
        [{"prompt_token_ids": base, "multi_modal_data": {"image": pil}}],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))

    # torch oracle
    with torch.no_grad():
        hs = vit(torch.tensor(pv), output_hidden_states=True).hidden_states
        feats = hs[-2][:, 1:]  # [N, g*g, DV]
        glb = _newline(_merge_2x2(feats[:1], 1, 1), sub_gn)[0]
        sub = _newline(_merge_2x2(feats[1:1 + hc * wc], hc, wc), sub_gn)[0]
        emb = torch.cat([sub, glb_gn[0], glb], dim=0)
        emb = F.gelu(emb @ w1.T + b1) @ w2.T + b2
        embeds = lm.get_input_embeddings()(torch.tensor([expanded]))
        off, ln = spans[0]
        embeds[0, off:off + ln] = emb
        exp = lm.generate(inputs_embeds=embeds, max_new_tokens=6,
                          do_sample=False, eos_token_id=None)
    assert outs[0].outputs[0].token_ids == exp[0].tolist()
