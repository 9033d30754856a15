"""Live-server multimodal E2E: /v1/chat/completions with an image_url
content part (base64 data URL) against a tiny LLaVA checkpoint."""
import base64
import io

import numpy as np
import pytest


@pytest.fixture(scope="module")
def llava_ckpt(tmp_path_factory):
    import torch
    from transformers import (CLIPVisionConfig, LlamaConfig, LlavaConfig,
                              LlavaForConditionalGeneration)
    from tests.utils import build_tiny_tokenizer
    d = tmp_path_factory.mktemp("llava_srv")
    tok = build_tiny_tokenizer(d)
    tok.add_special_tokens({"additional_special_tokens": ["<image>"]})
    tok.save_pretrained(str(d))
    img_id = tok.convert_tokens_to_ids("<image>")
    vision = CLIPVisionConfig(hidden_size=32, num_hidden_layers=2,
                              num_attention_heads=2, intermediate_size=64,
                              image_size=16, patch_size=8)
    text = LlamaConfig(vocab_size=max(256, img_id + 1), hidden_size=64,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2, intermediate_size=128,
                       max_position_embeddings=512,
                       tie_word_embeddings=False)
    cfg = LlavaConfig(vision_config=vision.to_dict(),
                      text_config=text.to_dict(), image_token_index=img_id,
                      vision_feature_layer=-2,
                      vision_feature_select_strategy="default",
                      pad_token_id=0)
    torch.manual_seed(0)
    LlavaForConditionalGeneration(cfg).save_pretrained(
        d, safe_serialization=True)
    return d


def _png_data_url() -> str:
    from PIL import Image
    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, (16, 16, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return "data:image/png;base64," + \
        base64.b64encode(buf.getvalue()).decode()


def test_chat_with_image(llava_ckpt):
    import httpx
    from tests.utils import RemoteOpenAIServer
    with RemoteOpenAIServer(str(llava_ckpt)) as srv:
        r = httpx.post(
            srv.base_url + "/v1/chat/completions",
            json={"model": "m", "max_tokens": 8, "temperature": 0.0,
                  "messages": [{"role": "user", "content": [
                      {"type": "text", "text": "what is this? "},
                      {"type": "image_url",
                       "image_url": {"url": _png_data_url()}},
                  ]}]},
            timeout=180)
        assert r.status_code == 200, r.text
        msg = r.json()["choices"][0]["message"]
        assert isinstance(msg["content"], str)
        # http URLs must be rejected (no egress from the server).
        r2 = httpx.post(
            srv.base_url + "/v1/chat/completions",
            json={"model": "m", "max_tokens": 4,
                  "messages": [{"role": "user", "content": [
                      {"type": "image_url",
                       "image_url": {"url": "http://example.com/x.png"}},
                  ]}]},
            timeout=60)
        assert r2.status_code == 400
