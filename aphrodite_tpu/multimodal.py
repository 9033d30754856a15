"""Multimodal input pipeline: images -> pixel tensors + placeholder spans.

Reference surface: aphrodite/multimodal/{registry,processing}.py and the
v1 encoder-cache design (aphrodite/v1/core/encoder_cache_manager.py). The
TPU rebuild keeps the *mechanism* — per-architecture adapters that (a)
preprocess raw images into model pixel tensors and (b) expand image
placeholder tokens in the prompt, recording the span each image's
embeddings occupy — but drives the merge with a device-side scatter in the
jitted step instead of torch masked_scatter.

Frontend-only: adapters need the HF config (geometry + token ids), never
the model, so the processor works in the API process in MP mode.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import numpy as np


@dataclass
class MMInputs:
    """Processed multimodal payload attached to a Request (pickled across
    the ZMQ engine-core boundary in MP mode)."""
    # Model-ready pixel tensor, [N_images, 3, S, S] float32 — or, with
    # is_embeddings=True, pre-computed embedding rows [N_tokens, hidden]
    # (prompt adapters / soft prompts; no encoder pass).
    pixel_values: np.ndarray
    # Per image: (token_offset, num_tokens) span in the expanded prompt.
    spans: list[tuple[int, int]]
    is_embeddings: bool = False
    # Model-specific extras forwarded to encode_images (e.g. Qwen2-VL
    # grid_thw [N, 3]).
    extra: Optional[dict] = None

    @property
    def num_images(self) -> int:
        return int(self.pixel_values.shape[0])

    def content_hash(self) -> int:
        """Mixed into KV block hashes so identical placeholder token ids
        with different images never alias in the prefix cache (reference:
        mm extra keys, aphrodite/v1/core/kv_cache_utils.py:365)."""
        return hash(self.pixel_values.tobytes())


class WhisperAdapter:
    """Audio -> padded log-mel features (reference: whisper transcription
    inputs). Accepts a 16 kHz float waveform, an (array, sample_rate)
    tuple (linear resample), or precomputed [n_mels, 3000] features."""

    media_key = "audio"

    def __init__(self, hf_config) -> None:
        self.n_mels = hf_config.num_mel_bins
        # conv2 halves time: mel frames = 2 * max_source_positions, and the
        # extractor produces 100 frames/s.
        chunk_s = hf_config.max_source_positions * 2 // 100
        from transformers import WhisperFeatureExtractor
        self.fe = WhisperFeatureExtractor(feature_size=self.n_mels,
                                          chunk_length=max(chunk_s, 1))

    def preprocess(self, audio: Any) -> np.ndarray:
        if isinstance(audio, np.ndarray) and audio.ndim == 2 \
                and audio.shape[0] == self.n_mels:
            return audio[None].astype(np.float32)  # precomputed features
        if isinstance(audio, tuple):
            wav, sr = audio
            wav = np.asarray(wav, np.float32).reshape(-1)
            if sr != 16000:
                n_out = int(round(len(wav) * 16000 / sr))
                wav = np.interp(
                    np.linspace(0, len(wav) - 1, n_out),
                    np.arange(len(wav)), wav).astype(np.float32)
        else:
            wav = np.asarray(audio, np.float32).reshape(-1)
        feats = self.fe(wav, sampling_rate=16000,
                        return_tensors="np")["input_features"]
        return feats.astype(np.float32)  # [1, n_mels, 3000]

    def expand_prompt(self, token_ids: list[int], num_items: int
                      ) -> tuple[list[int], list[tuple[int, int]]]:
        # Cross-attention consumption: no placeholder tokens in the prompt.
        return list(token_ids), []


class LlavaAdapter:
    """LLaVA-style VLMs: one flat grid of ViT patch tokens per image,
    merged at ``image_token_index`` positions (reference:
    aphrodite/modeling/models/llava.py)."""

    def __init__(self, hf_config) -> None:
        self.hf = hf_config
        vc = hf_config.vision_config
        self.image_token_id = hf_config.image_token_index
        self.image_size = vc.image_size
        self.patch_size = vc.patch_size
        grid = vc.image_size // vc.patch_size
        strategy = getattr(hf_config, "vision_feature_select_strategy",
                           "default")
        self.tokens_per_image = grid * grid + (1 if strategy == "full"
                                               else 0)
        self.image_mean = np.asarray(
            getattr(vc, "image_mean", (0.48145466, 0.4578275, 0.40821073)),
            np.float32)
        self.image_std = np.asarray(
            getattr(vc, "image_std", (0.26862954, 0.26130258, 0.27577711)),
            np.float32)

    # ------------------------------------------------------------ preprocess
    def preprocess(self, images: Any) -> np.ndarray:
        """images: one of, or a list of: PIL.Image, HWC uint8/float array,
        or an already-normalized CHW float array (passed through)."""
        if isinstance(images, np.ndarray) and images.ndim == 4:
            images = list(images)  # already-batched NCHW pixel values
        elif not isinstance(images, (list, tuple)):
            images = [images]
        out = []
        for img in images:
            arr = self._to_chw(img)
            out.append(arr)
        return np.stack(out).astype(np.float32)

    def _to_chw(self, img) -> np.ndarray:
        S = self.image_size
        if hasattr(img, "resize") and not isinstance(img, np.ndarray):
            # PIL image: bicubic resize to the square model resolution
            # (CLIPImageProcessor semantics: resize shortest edge + center
            # crop degenerate to a square resize for square inputs; we
            # resize directly — standard serving practice).
            img = img.convert("RGB").resize((S, S), resample=3)
            img = np.asarray(img)
        arr = np.asarray(img)
        if arr.ndim != 3:
            raise ValueError(f"image must be HWC or CHW, got {arr.shape}")
        if arr.shape[0] == 3 and arr.shape[-1] != 3:
            # CHW float: assume caller already normalized (e.g. HF
            # pixel_values) — pass through after a size check.
            if arr.shape[1] != S or arr.shape[2] != S:
                raise ValueError(
                    f"CHW pixel input must be [3,{S},{S}], got {arr.shape}")
            return arr.astype(np.float32)
        if arr.shape[1] != S or arr.shape[0] != S:
            raise ValueError(
                f"HWC image must be {S}x{S} (resize first or pass PIL), "
                f"got {arr.shape}")
        arr = arr.astype(np.float32)
        if arr.max() > 1.5:  # uint8 range
            arr = arr / 255.0
        arr = (arr - self.image_mean) / self.image_std
        return arr.transpose(2, 0, 1)

    # --------------------------------------------------------------- expand
    def expand_prompt(self, token_ids: list[int], num_images: int
                      ) -> tuple[list[int], list[tuple[int, int]]]:
        """Expand image placeholders to ``tokens_per_image`` repeats.

        Accepts either one placeholder per image (expanded here) or an
        already-expanded prompt (num_images * tokens_per_image placeholder
        occurrences — e.g. from an HF processor); returns the expanded ids
        plus per-image (offset, length) spans."""
        tid, P = self.image_token_id, self.tokens_per_image
        occurrences = [i for i, t in enumerate(token_ids) if t == tid]
        spans: list[tuple[int, int]] = []
        if len(occurrences) == num_images * P and num_images > 0:
            # Pre-expanded: recover spans from runs of placeholder ids.
            run_start = None
            expanded = list(token_ids)
            prev = -2
            for i in occurrences + [-1]:
                if i != prev + 1:
                    if run_start is not None:
                        spans.append((run_start, prev - run_start + 1))
                    run_start = i
                prev = i
            if sum(n for _, n in spans) != num_images * P:
                raise ValueError("placeholder runs do not tile images")
            return expanded, spans
        if len(occurrences) != num_images:
            raise ValueError(
                f"prompt has {len(occurrences)} image placeholders for "
                f"{num_images} images")
        expanded = []
        for i, t in enumerate(token_ids):
            if t == tid:
                spans.append((len(expanded), P))
                expanded.extend([tid] * P)
            else:
                expanded.append(t)
        return expanded, spans


LlavaAdapter.media_key = "image"


class PaliGemmaAdapter(LlavaAdapter):
    """PaliGemma: SigLIP grid (no CLS option), 0.5/0.5 normalization
    (reference: modeling/models/paligemma.py input mapping)."""

    def __init__(self, hf_config) -> None:
        super().__init__(hf_config)
        vc = hf_config.vision_config
        grid = vc.image_size // vc.patch_size
        self.tokens_per_image = grid * grid
        self.image_mean = np.asarray(
            getattr(vc, "image_mean", (0.5, 0.5, 0.5)), np.float32)
        self.image_std = np.asarray(
            getattr(vc, "image_std", (0.5, 0.5, 0.5)), np.float32)


PaliGemmaAdapter.media_key = "image"


class ChameleonAdapter(LlavaAdapter):
    """Chameleon: images -> VQGAN latent grid of discrete tokens; pixels
    normalized to [-1, 1] (HF ChameleonImageProcessor rescale 1/127.5,
    mean/std 1.0)."""

    media_key = "image"

    def __init__(self, hf_config) -> None:
        self.hf = hf_config
        vq = hf_config.vq_config
        self.image_size = vq.resolution
        self.patch_size = 1
        grid = vq.resolution // (2 ** (len(vq.channel_multiplier) - 1))
        self.tokens_per_image = grid * grid
        vmap = dict(getattr(hf_config, "vocabulary_map", None) or {})
        self.image_token_id = vmap.get("<image>", 8711)
        self.image_mean = np.asarray((0.5, 0.5, 0.5), np.float32)
        self.image_std = np.asarray((0.5, 0.5, 0.5), np.float32)


class QwenVL1Adapter(LlavaAdapter):
    """Qwen-VL v1: n_queries resampled tokens per image (<imgpad> runs
    between <img>/</img> in the prompt)."""

    media_key = "image"

    def __init__(self, hf_config) -> None:
        self.hf = hf_config
        vc = getattr(hf_config, "visual", None) or {}
        if not isinstance(vc, dict):
            vc = vc.to_dict() if hasattr(vc, "to_dict") else vars(vc)
        self.image_size = vc.get("image_size", 448)
        self.patch_size = vc.get("patch_size", 14)
        self.tokens_per_image = int(vc.get("n_queries", 256))
        self.image_token_id = getattr(hf_config, "image_token_id", None) \
            or vc.get("image_start_id", 151857) + 2
        self.image_mean = np.asarray(
            vc.get("image_mean", (0.48145466, 0.4578275, 0.40821073)),
            np.float32)
        self.image_std = np.asarray(
            vc.get("image_std", (0.26862954, 0.26130258, 0.27577711)),
            np.float32)


class GLM4VAdapter(LlavaAdapter):
    """GLM-4V: (grid/2)^2 conv-downsampled tokens + boi/eoi rows."""

    media_key = "image"

    def __init__(self, hf_config) -> None:
        self.hf = hf_config
        vc = getattr(hf_config, "vision_config", None)
        if vc is not None and not isinstance(vc, dict):
            vc = vc.to_dict() if hasattr(vc, "to_dict") else vars(vc)
        vc = vc or {}
        self.image_size = vc.get("image_size", 1120)
        self.patch_size = vc.get("patch_size", 14)
        grid = self.image_size // self.patch_size
        self.tokens_per_image = (grid // 2) ** 2 + 2
        self.image_token_id = getattr(hf_config, "image_token_id", None) \
            or getattr(hf_config, "boi_token_id", None)
        if self.image_token_id is None:
            raise ValueError("GLM-4V serving needs image_token_id (or "
                             "boi_token_id) on the config")
        self.image_mean = np.asarray(
            (0.48145466, 0.4578275, 0.40821073), np.float32)
        self.image_std = np.asarray(
            (0.26862954, 0.26130258, 0.27577711), np.float32)


class DeepseekVL2Adapter:
    """DeepSeek-VL2: global tile + tw x th local tiles (candidate
    resolutions); tokens per image = h*(w+1) global + th*h*(tw*w+1) local
    + 1 separator, h = w = ceil(grid / downsample_ratio). Accepts
    pre-tiled [1+tw*th,3,S,S] arrays (+"crops"), dicts, or PIL (global +
    one local view)."""

    media_key = "image"

    def __init__(self, hf_config) -> None:
        vc = hf_config.vision_config
        pc = hf_config.projector_config
        self.S = vc.image_size
        g = vc.image_size // vc.patch_size
        import math as _m
        self.hw = _m.ceil(g / int(getattr(pc, "downsample_ratio", 2)))
        self.image_token_id = getattr(hf_config, "image_token_id", None)
        if self.image_token_id is None:
            raise ValueError("DeepSeek-VL2 serving needs image_token_id on "
                             "the config")
        self.image_mean = np.asarray((0.5, 0.5, 0.5), np.float32)
        self.image_std = np.asarray((0.5, 0.5, 0.5), np.float32)

    def _tokens(self, tw: int, th: int) -> int:
        h = w = self.hw
        return h * (w + 1) + th * h * (tw * w + 1) + 1

    def _prep(self, item):
        if isinstance(item, dict):
            pv = np.asarray(item["pixel_values"], np.float32)
            if pv.ndim == 5:
                pv = pv[0]
            tw, th = (int(x) for x in item.get("crops", (1, 1)))
            return pv[:1 + tw * th], tw, th
        if isinstance(item, np.ndarray):
            arr = item.astype(np.float32)
            if arr.ndim == 3:
                arr = np.stack([arr, arr])  # global + one local view
            n = arr.shape[0] - 1
            tw = int(np.sqrt(n)) or 1
            while n % tw:
                tw -= 1
            return arr, tw, n // tw
        # PIL: global view + one identical local view (1x1 crop).
        S = self.S
        img = item.convert("RGB").resize((S, S), resample=3)
        arr = (np.asarray(img, np.float32) / 255.0 - self.image_mean) \
            / self.image_std
        tile = arr.transpose(2, 0, 1)
        return np.stack([tile, tile]), 1, 1

    def process(self, media, token_ids: list[int]):
        items = media if isinstance(media, (list, tuple)) else [media]
        if isinstance(media, (dict, np.ndarray)):
            items = [media]
        prepped = [self._prep(i) for i in items]
        counts = [self._tokens(tw, th) for _, tw, th in prepped]
        tid = self.image_token_id
        occurrences = [i for i, t in enumerate(token_ids) if t == tid]
        spans: list[tuple[int, int]] = []
        if len(occurrences) == sum(counts) and counts:
            expanded = list(token_ids)
            runs, run_start, prev = [], None, -2
            for i in occurrences + [-1]:
                if i != prev + 1:
                    if run_start is not None:
                        runs.append((run_start, prev - run_start + 1))
                    run_start = i
                prev = i
            ci = 0
            for off, ln in runs:
                while ln > 0:
                    spans.append((off, counts[ci]))
                    off += counts[ci]
                    ln -= counts[ci]
                    ci += 1
            if ci != len(counts):
                raise ValueError("placeholder runs do not tile images")
        elif len(occurrences) == len(counts):
            expanded, ci = [], 0
            for t in token_ids:
                if t == tid:
                    spans.append((len(expanded), counts[ci]))
                    expanded.extend([tid] * counts[ci])
                    ci += 1
                else:
                    expanded.append(t)
        else:
            raise ValueError(
                f"prompt has {len(occurrences)} image placeholders for "
                f"{len(counts)} images")
        pv = np.concatenate([p for p, _, _ in prepped], axis=0)
        crops = tuple((tw, th) for _, tw, th in prepped)
        return pv, expanded, spans, {"crops": crops}


class MiniCPMVAdapter:
    """MiniCPM-V: variable-aspect slices, query_num resampled tokens per
    slice. Accepts dicts {"pixel_values": [[3,h,w] slices],
    "tgt_sizes": [(gh, gw) patch grids]} (the remote processor's output)
    or PIL images (single adaptive slice, dims snapped to the patch
    size)."""

    media_key = "image"

    def __init__(self, hf_config) -> None:
        vc = hf_config.vision_config
        self.patch = vc.patch_size
        self.max_side = vc.image_size
        self.query_num = int(getattr(hf_config, "query_num", 64))
        self.image_token_id = getattr(hf_config, "image_token_id", None)
        if self.image_token_id is None:
            raise ValueError("MiniCPM-V serving needs image_token_id on "
                             "the config")
        self.image_mean = np.asarray((0.5, 0.5, 0.5), np.float32)
        self.image_std = np.asarray((0.5, 0.5, 0.5), np.float32)

    def _prep_pil(self, img) -> tuple[np.ndarray, tuple[int, int]]:
        ps, S = self.patch, self.max_side
        img = img.convert("RGB")
        w, h = img.size
        scale = min(1.0, S / max(w, h))
        tw = max(ps, int(round(w * scale / ps)) * ps)
        th = max(ps, int(round(h * scale / ps)) * ps)
        arr = np.asarray(img.resize((tw, th), resample=3), np.float32)
        arr = ((arr / 255.0 - self.image_mean) / self.image_std
               ).transpose(2, 0, 1)
        return arr, (th // ps, tw // ps)

    def process(self, media, token_ids: list[int]):
        items = media if isinstance(media, (list, tuple)) else [media]
        if isinstance(media, dict):
            items = [media]
        slices, grids, per_img = [], [], []
        for it in items:
            if isinstance(it, dict):
                pvs = [np.asarray(p, np.float32) for p in it["pixel_values"]]
                tg = [tuple(int(x) for x in t)
                      for t in np.asarray(it["tgt_sizes"])]
                slices.extend(pvs)
                grids.extend(tg)
                per_img.append(len(pvs))
            elif isinstance(it, np.ndarray):
                arr = it.astype(np.float32)
                gh, gw = arr.shape[1] // self.patch, \
                    arr.shape[2] // self.patch
                slices.append(arr)
                grids.append((gh, gw))
                per_img.append(1)
            else:
                arr, g = self._prep_pil(it)
                slices.append(arr)
                grids.append(g)
                per_img.append(1)
        counts = [n * self.query_num for n in per_img]
        tid = self.image_token_id
        occurrences = [i for i, t in enumerate(token_ids) if t == tid]
        spans: list[tuple[int, int]] = []
        if len(occurrences) == sum(counts) and counts:
            expanded = list(token_ids)
            runs, run_start, prev = [], None, -2
            for i in occurrences + [-1]:
                if i != prev + 1:
                    if run_start is not None:
                        runs.append((run_start, prev - run_start + 1))
                    run_start = i
                prev = i
            ci = 0
            for off, ln in runs:
                while ln > 0:
                    spans.append((off, counts[ci]))
                    off += counts[ci]
                    ln -= counts[ci]
                    ci += 1
            if ci != len(counts):
                raise ValueError("placeholder runs do not tile images")
        elif len(occurrences) == len(counts):
            expanded, ci = [], 0
            for t in token_ids:
                if t == tid:
                    spans.append((len(expanded), counts[ci]))
                    expanded.extend([tid] * counts[ci])
                    ci += 1
                else:
                    expanded.append(t)
        else:
            raise ValueError(
                f"prompt has {len(occurrences)} image placeholders for "
                f"{len(counts)} images")
        ps = self.patch
        Hm = max(p.shape[1] for p in slices)
        Wm = max(p.shape[2] for p in slices)
        pv = np.zeros((len(slices), 3, Hm, Wm), np.float32)
        for i, p in enumerate(slices):
            pv[i, :, :p.shape[1], :p.shape[2]] = p
        return pv, expanded, spans, {"sizes": tuple(grids)}


class AriaAdapter(LlavaAdapter):
    """Aria: each image resamples to patch_to_query_dict[num_patches]
    learned queries."""

    media_key = "image"

    def __init__(self, hf_config) -> None:
        self.hf = hf_config
        vc = hf_config.vision_config
        self.image_token_id = getattr(hf_config, "image_token_index", 9)
        self.image_size = vc.image_size
        self.patch_size = vc.patch_size
        grid = vc.image_size // vc.patch_size
        p2q = {int(k): int(v) for k, v in
               dict(getattr(hf_config, "projector_patch_to_query_dict",
                            {}) or {}).items()}
        self.tokens_per_image = p2q.get(grid * grid, 128)
        self.image_mean = np.asarray((0.5, 0.5, 0.5), np.float32)
        self.image_std = np.asarray((0.5, 0.5, 0.5), np.float32)


class Blip2Adapter(LlavaAdapter):
    """BLIP-2: each image contributes num_query_tokens Q-Former rows.
    Prompts may carry placeholder tokens (newer HF layout) or none at all —
    then the image block is PREPENDED (original BLIP-2 layout)."""

    media_key = "image"

    def __init__(self, hf_config) -> None:
        self.hf = hf_config
        vc = hf_config.vision_config
        self.image_token_id = getattr(hf_config, "image_token_index", None)
        self.image_size = vc.image_size
        self.patch_size = vc.patch_size
        self.tokens_per_image = getattr(hf_config, "num_query_tokens", 32)
        self.image_mean = np.asarray(
            (0.48145466, 0.4578275, 0.40821073), np.float32)
        self.image_std = np.asarray(
            (0.26862954, 0.26130258, 0.27577711), np.float32)

    def expand_prompt(self, token_ids: list[int], num_images: int
                      ) -> tuple[list[int], list[tuple[int, int]]]:
        tid = self.image_token_id
        if tid is not None and any(t == tid for t in token_ids):
            return super().expand_prompt(token_ids, num_images)
        # No placeholders: prepend one query block per image.
        Q = self.tokens_per_image
        fill = tid if tid is not None else 0
        spans = [(i * Q, Q) for i in range(num_images)]
        return [fill] * (num_images * Q) + list(token_ids), spans


class Gemma3Adapter(LlavaAdapter):
    """Gemma-3 MM: SigLIP grid pooled to ``mm_tokens_per_image``
    placeholder tokens; 0.5/0.5 normalization (reference gemma3_mm.py
    processor path, pan-and-scan off — the serving default)."""

    media_key = "image"

    def __init__(self, hf_config) -> None:
        super().__init__(hf_config)
        vc = hf_config.vision_config
        self.tokens_per_image = int(getattr(hf_config,
                                            "mm_tokens_per_image", 256))
        self.image_mean = np.asarray(
            getattr(vc, "image_mean", (0.5, 0.5, 0.5)), np.float32)
        self.image_std = np.asarray(
            getattr(vc, "image_std", (0.5, 0.5, 0.5)), np.float32)

class Qwen2AudioAdapter:
    """Qwen2-Audio: 30 s log-mel chunks; per-audio token counts follow the
    conv2/avg-pool length formula (reference qwen2_audio.py input mapping).
    Accepts waveforms, (wav, sr) tuples, or a pre-extracted dict
    {"input_features", "feature_attention_mask"}."""

    media_key = "audio"

    def __init__(self, hf_config) -> None:
        ac = hf_config.audio_config
        self.audio_token_id = hf_config.audio_token_index
        self.n_mels = ac.num_mel_bins
        self.frames = ac.max_source_positions * 2
        self._fe = None

    def _extract(self, wav) -> tuple[np.ndarray, int]:
        if self._fe is None:
            from transformers import WhisperFeatureExtractor
            self._fe = WhisperFeatureExtractor(
                feature_size=self.n_mels,
                chunk_length=max(self.frames // 100, 1))
        if isinstance(wav, tuple):
            arr, sr = wav
            arr = np.asarray(arr, np.float32).reshape(-1)
            if sr != 16000:
                n_out = int(round(len(arr) * 16000 / sr))
                arr = np.interp(np.linspace(0, len(arr) - 1, n_out),
                                np.arange(len(arr)), arr).astype(np.float32)
        else:
            arr = np.asarray(wav, np.float32).reshape(-1)
        out = self._fe(arr, sampling_rate=16000, return_tensors="np",
                       return_attention_mask=True)
        feats = out["input_features"][0].astype(np.float32)
        real = int(out["attention_mask"][0].sum())
        return feats, real

    def _count(self, mel_len: int) -> int:
        from aphrodite_tpu.models.audio_lm import audio_output_lengths
        return audio_output_lengths(mel_len)

    def process(self, media, token_ids: list[int]):
        if isinstance(media, dict):
            feats = np.asarray(media["input_features"], np.float32)
            fam = np.asarray(media["feature_attention_mask"])
            lens = [int(r.sum()) for r in fam]
        else:
            items = media if isinstance(media, list) else [media]
            pairs = [self._extract(w) for w in items]
            feats = np.stack([p[0] for p in pairs])
            lens = [p[1] for p in pairs]
        counts = [self._count(fl) for fl in lens]
        tid = self.audio_token_id
        occurrences = [i for i, t in enumerate(token_ids) if t == tid]
        spans: list[tuple[int, int]] = []
        if len(occurrences) == sum(counts) and counts:
            expanded = list(token_ids)
            run_start, prev, runs = None, -2, []
            for i in occurrences + [-1]:
                if i != prev + 1:
                    if run_start is not None:
                        runs.append((run_start, prev - run_start + 1))
                    run_start = i
                prev = i
            ci = 0
            for off, ln in runs:
                while ln > 0:
                    spans.append((off, counts[ci]))
                    off += counts[ci]
                    ln -= counts[ci]
                    ci += 1
            if ci != len(counts):
                raise ValueError("audio placeholder runs do not tile items")
            return feats, expanded, spans, {"feat_lens": tuple(lens)}
        if len(occurrences) != len(counts):
            raise ValueError(
                f"prompt has {len(occurrences)} audio placeholders for "
                f"{len(counts)} audios")
        expanded, ci = [], 0
        for t in token_ids:
            if t == tid:
                spans.append((len(expanded), counts[ci]))
                expanded.extend([tid] * counts[ci])
                ci += 1
            else:
                expanded.append(t)
        return feats, expanded, spans, {"feat_lens": tuple(lens)}


class Idefics3Adapter(LlavaAdapter):
    """Idefics3/SmolVLM: fixed-size square images (unsplit serving mode);
    each image -> (grid/scale_factor)^2 placeholder tokens."""

    media_key = "image"

    def __init__(self, hf_config) -> None:
        self.hf = hf_config
        vc = hf_config.vision_config
        self.image_token_id = hf_config.image_token_id
        self.image_size = vc.image_size
        self.patch_size = vc.patch_size
        grid = vc.image_size // vc.patch_size
        s = getattr(hf_config, "scale_factor", 2)
        self.tokens_per_image = (grid // s) ** 2
        self.image_mean = np.asarray((0.5, 0.5, 0.5), np.float32)
        self.image_std = np.asarray((0.5, 0.5, 0.5), np.float32)


class FuyuAdapter:
    """Fuyu: channel-last pixel patches, per-row placeholder runs separated
    by |NEWLINE| tokens (reference fuyu.py input mapping). Images must
    arrive pre-sized (HWC/CHW arrays; dims padded up to patch multiples)."""

    media_key = "image"
    NEWLINE_ID = 71019  # |NEWLINE| (reference fuyu.py _NEWLINE_TOKEN_ID)

    def __init__(self, hf_config) -> None:
        self.patch = getattr(hf_config, "patch_size", 30)
        self.image_token_id = getattr(hf_config, "image_token_id", 71011)
        vocab = getattr(hf_config, "vocab_size", 0) or \
            getattr(getattr(hf_config, "text_config", None), "vocab_size", 0)
        self.newline_id = self.NEWLINE_ID if vocab > self.NEWLINE_ID \
            else vocab - 1

    def _patchify(self, img) -> tuple[np.ndarray, int, int]:
        arr = np.asarray(img, np.float32)
        if arr.ndim == 3 and arr.shape[0] == 3 and arr.shape[-1] != 3:
            arr = arr.transpose(1, 2, 0)  # CHW -> HWC
        if arr.max() > 1.5:
            arr = arr / 255.0
        arr = (arr - 0.5) / 0.5
        p = self.patch
        H, W, C = arr.shape
        ph, pw = -(-H // p), -(-W // p)
        pad = np.ones((ph * p, pw * p, C), np.float32)
        pad[:H, :W] = arr
        # channel-last patch vectors (HF patchify_image: (p, p, C) order)
        x = pad.reshape(ph, p, pw, p, C).transpose(0, 2, 1, 3, 4)
        return x.reshape(ph * pw, p * p * C), ph, pw

    def process(self, media, token_ids: list[int]):
        items = media if isinstance(media, list) else [media]
        if isinstance(media, np.ndarray) and media.ndim == 4:
            items = list(media)
        packed, geoms = [], []
        for img in items:
            patches, nrow, ncol = self._patchify(img)
            packed.append(patches)
            geoms.append((nrow, ncol))
        pv = np.concatenate(packed, axis=0)
        tid = self.image_token_id
        occurrences = [i for i, t in enumerate(token_ids) if t == tid]
        if len(occurrences) != len(items):
            raise ValueError(
                f"prompt has {len(occurrences)} image placeholders for "
                f"{len(items)} images")
        expanded: list[int] = []
        spans: list[tuple[int, int]] = []
        ci = 0
        for t in token_ids:
            if t == tid:
                nrow, ncol = geoms[ci]
                for _ in range(nrow):
                    spans.append((len(expanded), ncol))
                    expanded.extend([tid] * ncol)
                    expanded.append(self.newline_id)
                ci += 1
            else:
                expanded.append(t)
        return pv, expanded, spans, {"patch_counts":
                                     tuple(r * c for r, c in geoms)}


class UltravoxAdapter(Qwen2AudioAdapter):
    """Ultravox: unpooled Whisper features, stack_factor frame stacking
    (reference ultravox.py processing)."""

    def __init__(self, hf_config) -> None:
        ac = hf_config.audio_config
        # vLLM serves Ultravox with a fixed placeholder id on llama3
        # vocabularies (ultravox.py _AUDIO_PLACEHOLDER_TOKEN).
        self.audio_token_id = getattr(hf_config, "audio_token_index",
                                      None) or 128002
        self.n_mels = ac.num_mel_bins
        self.frames = ac.max_source_positions * 2
        self._fe = None
        self.stack_factor = getattr(hf_config, "stack_factor", 8)

    def _count(self, mel_len: int) -> int:
        from aphrodite_tpu.models.audio_lm import ultravox_token_count
        return ultravox_token_count(mel_len, self.stack_factor)


class LlavaNextAdapter:
    """LLaVA-Next family: anyres tiled images (+ videos for Next-Video /
    OneVision). Per-image token counts replicate HF pack_image_features
    (reference llava_next.py / llava_onevision.py input mapping).

    Media items accepted per image: PIL image (HF LlavaNextImageProcessor
    run in-process) or a dict {"pixel_values": [tiles,3,S,S] or
    [1,tiles,3,S,S], "image_sizes": (H, W)} (pre-processed pass-through).
    Videos: float arrays [F,3,S,S] (pre-sized frames) under key "video"."""

    media_keys = ("image", "video")
    media_key = "image"

    def __init__(self, hf_config) -> None:
        self.hf = hf_config
        vc = hf_config.vision_config
        self.S = vc.image_size
        self.g = vc.image_size // vc.patch_size
        self.image_token_id = hf_config.image_token_index
        self.video_token_id = getattr(hf_config, "video_token_index", None)
        self.pinpoints = [tuple(p) for p in hf_config.image_grid_pinpoints]
        self.strategy = getattr(hf_config, "vision_feature_select_strategy",
                                "default")
        self.has_cls = "siglip" not in getattr(vc, "model_type",
                                               "clip_vision_model")
        self.aspect = getattr(hf_config, "vision_aspect_ratio", None)
        self.pool_mode = getattr(hf_config, "spatial_pool_mode", None)
        self.pool_stride = getattr(hf_config, "spatial_pool_stride", 2)
        self._proc = None

    # ------------------------------------------------------------- geometry
    def _num_tiles(self, oh: int, ow: int) -> int:
        from aphrodite_tpu.models.llava_next import select_best_resolution
        bh, bw = select_best_resolution((oh, ow), self.pinpoints)
        return (bh // self.S) * (bw // self.S) + 1

    def _image_tokens(self, oh: int, ow: int, n_tiles: int) -> int:
        from aphrodite_tpu.models.llava_next import (select_best_resolution,
                                                     unpad_dims)
        import math as _m
        g = self.g
        seq = g * g + (1 if self.has_cls else 0)
        P = seq - (1 if self.strategy == "default" else 0)
        if n_tiles == 1:
            return P + 1
        bh, bw = select_best_resolution((oh, ow), self.pinpoints)
        nph, npw = bh // self.S, bw // self.S
        r0, r1, c0, c1 = unpad_dims(nph * g, npw * g, oh, ow)
        rows, cols = r1 - r0, c1 - c0
        if self.aspect:
            max_p = int(self.aspect.removeprefix("anyres_max_"))
            ratio = _m.sqrt(rows * cols / (max_p * g * g))
            if ratio > 1.1:
                rows, cols = int(rows // ratio), int(cols // ratio)
        return P + rows * (cols + 1)

    def _video_tokens(self, n_frames: int) -> int:
        import math as _m
        g = self.g
        if self.pool_mode is not None:  # Next-Video
            return n_frames * (g // self.pool_stride) ** 2
        return n_frames * _m.ceil(g / 2) ** 2 + 1  # OneVision (+newline)

    # ------------------------------------------------------------ preprocess
    def _prep_image(self, img) -> tuple[np.ndarray, tuple[int, int]]:
        """-> (tiles [n,3,S,S] float32, original (H, W))."""
        if isinstance(img, dict):
            pv = np.asarray(img["pixel_values"], np.float32)
            if pv.ndim == 5:
                pv = pv[0]
            size = img.get("image_sizes", img.get("image_size"))
            size = np.asarray(size).reshape(-1)[:2]
            oh, ow = int(size[0]), int(size[1])
            return pv[:self._num_tiles(oh, ow)], (oh, ow)
        if self._proc is None:
            from transformers.models.llava_next.image_processing_llava_next \
                import LlavaNextImageProcessor
            self._proc = LlavaNextImageProcessor(
                size={"shortest_edge": self.S},
                crop_size={"height": self.S, "width": self.S},
                image_grid_pinpoints=[list(p) for p in self.pinpoints])
        out = self._proc(images=[img], return_tensors="np")
        oh, ow = (int(x) for x in out["image_sizes"][0])
        return (out["pixel_values"][0][:self._num_tiles(oh, ow)]
                .astype(np.float32), (oh, ow))

    def _prep_video(self, vid) -> np.ndarray:
        arr = np.asarray(vid, np.float32)
        if arr.ndim == 4 and arr.shape[-1] == 3 and arr.shape[1] != 3:
            arr = arr.transpose(0, 3, 1, 2)  # FHWC -> FCHW
        if arr.shape[1:] != (3, self.S, self.S):
            raise ValueError(
                f"video frames must be [F,3,{self.S},{self.S}], "
                f"got {arr.shape}")
        return arr

    # --------------------------------------------------------------- process
    def process(self, media, token_ids: list[int]):
        if not isinstance(media, dict) or "pixel_values" in media:
            media = {"image": media}
        images = media.get("image")
        videos = media.get("video")

        def listify(x):
            if x is None:
                return []
            if isinstance(x, np.ndarray) and x.ndim == 5:
                return list(x)
            return x if isinstance(x, (list, tuple)) else [x]

        images, videos = listify(images), listify(videos)
        img_items = [self._prep_image(i) for i in images]
        vid_items = [self._prep_video(v) for v in videos]

        # Pre-expanded prompts (HF-processor style) carry one placeholder
        # per feature token; unexpanded prompts carry one per media item.
        img_tokens = [self._image_tokens(hw[0], hw[1], t.shape[0])
                      for t, hw in img_items]
        vid_tokens = [self._video_tokens(f.shape[0]) for f in vid_items]
        occ_img = sum(1 for t in token_ids if t == self.image_token_id)
        occ_vid = sum(1 for t in token_ids if t == self.video_token_id) \
            if self.video_token_id is not None else 0
        img_pre = bool(img_items) and occ_img == sum(img_tokens)
        vid_pre = bool(vid_items) and occ_vid == sum(vid_tokens)

        items, arrays, spans = [], [], []
        expanded: list[int] = []
        ii = vi = pos = 0
        while pos < len(token_ids):
            t = token_ids[pos]
            if t == self.image_token_id and ii < len(img_items):
                tiles, hw = img_items[ii]
                n = img_tokens[ii]
                items.append(("img", tiles.shape[0], hw))
                arrays.append(tiles)
                spans.append((len(expanded), n))
                expanded.extend([t] * n)
                pos += n if img_pre else 1
                ii += 1
            elif self.video_token_id is not None \
                    and t == self.video_token_id and vi < len(vid_items):
                frames = vid_items[vi]
                n = vid_tokens[vi]
                items.append(("vid", frames.shape[0]))
                arrays.append(frames)
                spans.append((len(expanded), n))
                expanded.extend([t] * n)
                pos += n if vid_pre else 1
                vi += 1
            else:
                expanded.append(t)
                pos += 1
        if ii != len(img_items) or vi != len(vid_items):
            raise ValueError(
                f"prompt placeholders ({ii} image, {vi} video) do not match "
                f"supplied media ({len(img_items)} image, "
                f"{len(vid_items)} video)")
        pv = np.concatenate(arrays, axis=0) if arrays else \
            np.zeros((0, 3, self.S, self.S), np.float32)
        return pv, expanded, spans, {"items": tuple(items)}


class Llama4Adapter:
    """Llama 4 VLM: fixed-size tiles (+ optional global tile, produced by
    the HF Llama4 processor); every tile contributes (g*ratio)^2 feature
    tokens, contiguous per image. Accepts pre-tiled [n,3,S,S] arrays, a
    single [3,S,S] tile, or {"pixel_values": ...} dicts."""

    media_key = "image"

    def __init__(self, hf_config) -> None:
        vc = hf_config.vision_config
        self.S = vc.image_size
        g = vc.image_size // vc.patch_size
        r = float(getattr(vc, "pixel_shuffle_ratio", 0.5))
        self.tokens_per_tile = int(round((g * r) ** 2))
        self.image_token_id = getattr(hf_config, "image_token_index",
                                      200092)

    def _prep(self, item) -> np.ndarray:
        if isinstance(item, dict):
            item = item["pixel_values"]
        arr = np.asarray(item, np.float32)
        if arr.ndim == 3:
            arr = arr[None]
        if arr.ndim == 5:
            arr = arr.reshape((-1,) + arr.shape[2:])
        if arr.shape[1:] != (3, self.S, self.S):
            raise ValueError(
                f"Llama4 expects pre-tiled [n,3,{self.S},{self.S}] pixel "
                f"inputs (run the HF Llama4 processor), got {arr.shape}")
        return arr

    def process(self, media, token_ids: list[int]):
        items = media if isinstance(media, (list, tuple)) else [media]
        if isinstance(media, np.ndarray) and media.ndim == 4:
            items = [media]
        tiled = [self._prep(i) for i in items]
        counts = [t.shape[0] * self.tokens_per_tile for t in tiled]
        tid = self.image_token_id
        occurrences = [i for i, t in enumerate(token_ids) if t == tid]
        spans: list[tuple[int, int]] = []
        if len(occurrences) == sum(counts) and counts:
            expanded = list(token_ids)
            runs, run_start, prev = [], None, -2
            for i in occurrences + [-1]:
                if i != prev + 1:
                    if run_start is not None:
                        runs.append((run_start, prev - run_start + 1))
                    run_start = i
                prev = i
            ci = 0
            for off, ln in runs:
                while ln > 0:
                    spans.append((off, counts[ci]))
                    off += counts[ci]
                    ln -= counts[ci]
                    ci += 1
            if ci != len(counts):
                raise ValueError("placeholder runs do not tile images")
        elif len(occurrences) == len(counts):
            expanded, ci = [], 0
            for t in token_ids:
                if t == tid:
                    spans.append((len(expanded), counts[ci]))
                    expanded.extend([tid] * counts[ci])
                    ci += 1
                else:
                    expanded.append(t)
        else:
            raise ValueError(
                f"prompt has {len(occurrences)} image placeholders for "
                f"{len(counts)} images")
        return np.concatenate(tiled, axis=0), expanded, spans, None


class AyaVisionAdapter(Llama4Adapter):
    """Aya Vision: GotOCR-style tiles, (grid/downsample)^2 tokens per tile.
    PIL images run through the HF GotOcr2 image processor; pre-tiled
    arrays/dicts pass through (Llama4Adapter machinery)."""

    def __init__(self, hf_config) -> None:
        vc = hf_config.vision_config
        self.S = vc.image_size
        g = vc.image_size // vc.patch_size
        ds = int(getattr(hf_config, "downsample_factor", 2))
        self.tokens_per_tile = (g // ds) ** 2
        self.image_token_id = getattr(hf_config, "image_token_index", None) \
            or getattr(hf_config, "image_token_id", 255036)
        self._proc = None

    def _prep(self, item) -> np.ndarray:
        if not isinstance(item, (dict, np.ndarray)) and \
                hasattr(item, "resize"):
            if self._proc is None:
                from transformers.models.got_ocr2.image_processing_got_ocr2 \
                    import GotOcr2ImageProcessor
                self._proc = GotOcr2ImageProcessor(
                    size={"height": self.S, "width": self.S},
                    crop_to_patches=True)
            out = self._proc(images=[item], return_tensors="np")
            return out["pixel_values"].astype(np.float32)
        return super()._prep(item)


class MllamaAdapter:
    """MLlama (Llama 3.2 Vision): images are consumed through
    cross-attention — the prompt's <|image|> token stays a normal token and
    no placeholder expansion happens (spans=[]). Pixel preprocessing uses
    the HF MllamaImageProcessor (tile canvas selection + aspect-ratio ids);
    pre-processed dicts {"pixel_values", "aspect_ratio_ids",
    "aspect_ratio_mask"} pass through."""

    media_key = "image"

    def __init__(self, hf_config) -> None:
        vc = hf_config.vision_config
        self.S = vc.image_size
        self.max_tiles = getattr(vc, "max_num_tiles", 4)
        self._proc = None

    def process(self, media, token_ids: list[int]):
        if isinstance(media, dict):
            pv = np.asarray(media["pixel_values"], np.float32)
            ar = np.asarray(media["aspect_ratio_ids"]).reshape(-1)
            mask = np.asarray(media["aspect_ratio_mask"])
            mask = mask.reshape(-1, mask.shape[-1])
        else:
            items = media if isinstance(media, (list, tuple)) else [media]
            if self._proc is None:
                from transformers.models.mllama.image_processing_mllama \
                    import MllamaImageProcessor
                self._proc = MllamaImageProcessor(
                    size={"height": self.S, "width": self.S},
                    max_image_tiles=self.max_tiles)
            out = self._proc(images=[items], return_tensors="np")
            pv = out["pixel_values"].astype(np.float32)
            ar = np.asarray(out["aspect_ratio_ids"]).reshape(-1)
            mask = np.asarray(out["aspect_ratio_mask"])
            mask = mask.reshape(-1, mask.shape[-1])
        while pv.ndim > 5:
            pv = pv[0]
        num_tiles = mask.sum(-1).astype(np.int32)
        return pv, list(token_ids), [], {
            "aspect_ratio_ids": tuple(int(a) for a in ar),
            "num_tiles": tuple(int(t) for t in num_tiles)}


class Phi3VAdapter:
    """Phi-3-Vision HD transform (reference phi3v.py + the phi3.5-vision
    processor): landscape-orient, scale so the 336-tile grid fits
    ``num_crops``, pad height to a tile multiple (white), tile row-major;
    the global image is the padded image resized to one tile. Feature
    tokens per image: 12h*(12w+1) sub + 1 glb_GN + 12*13 global.

    Accepts PIL images or dicts {"pixel_values": [1+crops, 3, S, S],
    "image_sizes" | "crops": ...}. Negative placeholder ids are mapped to
    the image token (reference phi3v.py:389)."""

    media_key = "image"

    def __init__(self, hf_config) -> None:
        imgp = getattr(hf_config, "img_processor", None) or {}
        vit = imgp.get("vit_config") or {}
        self.S = vit.get("image_size", 336)
        g = self.S // vit.get("patch_size", 14)
        self.g2 = g // 2
        self.num_crops = getattr(hf_config, "num_crops", None) or \
            imgp.get("num_crops", 16)
        self.image_token_id = getattr(hf_config, "image_token_id", 32044)
        self.image_mean = np.asarray(
            (0.48145466, 0.4578275, 0.40821073), np.float32)
        self.image_std = np.asarray(
            (0.26862954, 0.26130258, 0.27577711), np.float32)

    def _tokens(self, hc: int, wc: int) -> int:
        g2 = self.g2
        return g2 * hc * (g2 * wc + 1) + 1 + g2 * (g2 + 1)

    def _norm(self, arr: np.ndarray) -> np.ndarray:
        arr = arr.astype(np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0
        return ((arr - self.image_mean) / self.image_std).transpose(2, 0, 1)

    def _hd(self, img) -> tuple[np.ndarray, int, int]:
        """PIL -> ([1 + hc*wc, 3, S, S], hc, wc); global tile first."""
        import math as _m
        from PIL import Image
        S = self.S
        img = img.convert("RGB")
        w, h = img.size
        trans = False
        if w < h:
            img = img.transpose(Image.TRANSPOSE)
            w, h = img.size
            trans = True
        ratio = w / h
        scale = 1
        while scale * _m.ceil(scale / ratio) <= self.num_crops:
            scale += 1
        scale -= 1
        new_w = max(int(scale * S), S)
        new_h = max(int(new_w / ratio), 1)
        img = img.resize((new_w, new_h), resample=3)
        target_h = int(_m.ceil(new_h / S) * S)
        top = (target_h - new_h) // 2
        arr = np.full((target_h, new_w, 3), 255, np.uint8)
        arr[top:top + new_h] = np.asarray(img)
        if trans:
            arr = arr.transpose(1, 0, 2)
        H, W = arr.shape[:2]
        hc, wc = H // S, W // S
        full = self._norm(arr)  # [3, H, W]
        tiles = full.reshape(3, hc, S, wc, S).transpose(1, 3, 0, 2, 4)
        tiles = tiles.reshape(hc * wc, 3, S, S)
        glb = np.asarray(Image.fromarray(arr).resize((S, S), resample=3))
        return np.concatenate([self._norm(glb)[None], tiles]), hc, wc

    def process(self, media, token_ids: list[int]):
        items = media if isinstance(media, (list, tuple)) else [media]
        if isinstance(media, np.ndarray) and media.ndim == 4:
            items = [media]
        prepped = []
        for it in items:
            if isinstance(it, dict):
                pv = np.asarray(it["pixel_values"], np.float32)
                if pv.ndim == 5:
                    pv = pv[0]
                if "crops" in it:
                    hc, wc = (int(x) for x in it["crops"])
                else:
                    sz = np.asarray(it["image_sizes"]).reshape(-1)[:2]
                    hc, wc = int(sz[0]) // self.S, int(sz[1]) // self.S
                prepped.append((pv[:1 + hc * wc], hc, wc))
            elif isinstance(it, np.ndarray):
                if it.ndim != 4 or it.shape[1:] != (3, self.S, self.S):
                    raise ValueError(
                        f"array input must be [1+crops,3,{self.S},"
                        f"{self.S}] (global tile first), got {it.shape}")
                n = it.shape[0] - 1
                hc = int(np.sqrt(n)) or 1
                while n % hc:
                    hc -= 1
                prepped.append((it.astype(np.float32), hc, n // hc))
            else:
                prepped.append(self._hd(it))
        tid = self.image_token_id
        token_ids = [tid if t < 0 else t for t in token_ids]
        counts = [self._tokens(hc, wc) for _, hc, wc in prepped]
        occurrences = [i for i, t in enumerate(token_ids) if t == tid]
        spans: list[tuple[int, int]] = []
        if len(occurrences) == sum(counts) and counts:
            expanded = list(token_ids)
            runs, run_start, prev = [], None, -2
            for i in occurrences + [-1]:
                if i != prev + 1:
                    if run_start is not None:
                        runs.append((run_start, prev - run_start + 1))
                    run_start = i
                prev = i
            ci = 0
            for off, ln in runs:
                while ln > 0:
                    spans.append((off, counts[ci]))
                    off += counts[ci]
                    ln -= counts[ci]
                    ci += 1
            if ci != len(counts):
                raise ValueError("placeholder runs do not tile images")
        elif len(occurrences) == len(counts):
            expanded, ci = [], 0
            for t in token_ids:
                if t == tid:
                    spans.append((len(expanded), counts[ci]))
                    expanded.extend([tid] * counts[ci])
                    ci += 1
                else:
                    expanded.append(t)
        else:
            raise ValueError(
                f"prompt has {len(occurrences)} image placeholders for "
                f"{len(counts)} images")
        pv = np.concatenate([p for p, _, _ in prepped], axis=0)
        crops = tuple((hc, wc) for _, hc, wc in prepped)
        return pv, expanded, spans, {"crops": crops}


class InternVLAdapter:
    """InternVL family (also NVLM-D / H2OVL / Skywork-R1V): dynamic tiling
    into fixed squares + optional thumbnail tile (reference internvl.py
    dynamic_preprocess); every tile contributes
    ``(grid * downsample_ratio)^2`` feature tokens, contiguous per image.

    Media items: PIL images (tiled here), pre-tiled [n,3,S,S] arrays, or a
    single [3,S,S] array. The IMG_CONTEXT token id comes from
    ``img_context_token_id`` / ``image_token_index`` on the config."""

    media_key = "image"

    def __init__(self, hf_config) -> None:
        vc = hf_config.vision_config
        self.S = getattr(hf_config, "force_image_size", None) or \
            vc.image_size
        g = self.S // vc.patch_size
        r = float(getattr(hf_config, "downsample_ratio", 0.5))
        self.tokens_per_tile = int(round((g * r) ** 2))
        self.image_token_id = getattr(hf_config, "img_context_token_id",
                                      None) or \
            getattr(hf_config, "image_token_index", None)
        if self.image_token_id is None:
            raise ValueError(
                "InternVL serving needs img_context_token_id (or "
                "image_token_index) on the config")
        dyn = getattr(hf_config, "dynamic_image_size", True)
        self.min_num = getattr(hf_config, "min_dynamic_patch", 1) \
            if dyn else 1
        self.max_num = getattr(hf_config, "max_dynamic_patch", 12) \
            if dyn else 1
        self.use_thumbnail = getattr(hf_config, "use_thumbnail", True)
        self.image_mean = np.asarray((0.485, 0.456, 0.406), np.float32)
        self.image_std = np.asarray((0.229, 0.224, 0.225), np.float32)

    def _target_ratio(self, ow: int, oh: int) -> tuple[int, int]:
        ratios = sorted(
            {(i, j) for n in range(self.min_num, self.max_num + 1)
             for i in range(1, n + 1) for j in range(1, n + 1)
             if self.min_num <= i * j <= self.max_num},
            key=lambda x: x[0] * x[1])
        aspect = ow / oh
        best, best_diff = (1, 1), float("inf")
        for i, j in ratios:
            diff = abs(aspect - i / j)
            if diff < best_diff:
                best_diff, best = diff, (i, j)
            elif diff == best_diff and \
                    ow * oh > 0.5 * self.S * self.S * i * j:
                best = (i, j)
        return best

    def _norm(self, arr: np.ndarray) -> np.ndarray:
        arr = arr.astype(np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0
        return ((arr - self.image_mean) / self.image_std).transpose(2, 0, 1)

    def _tile(self, img) -> np.ndarray:
        """PIL image -> [n_tiles, 3, S, S] (row-major tiles + thumbnail)."""
        S = self.S
        img = img.convert("RGB")
        ow, oh = img.size
        cols, rows = self._target_ratio(ow, oh)
        resized = img.resize((S * cols, S * rows), resample=3)
        arr = np.asarray(resized)
        tiles = [self._norm(arr[r * S:(r + 1) * S, c * S:(c + 1) * S])
                 for r in range(rows) for c in range(cols)]
        if self.use_thumbnail and len(tiles) != 1:
            tiles.append(self._norm(np.asarray(
                img.resize((S, S), resample=3))))
        return np.stack(tiles)

    def _prep(self, item) -> np.ndarray:
        if hasattr(item, "resize") and not isinstance(item, np.ndarray):
            return self._tile(item)
        arr = np.asarray(item, np.float32)
        if arr.ndim == 3:
            arr = arr[None]
        if arr.shape[1:] != (3, self.S, self.S):
            raise ValueError(
                f"pre-tiled input must be [n,3,{self.S},{self.S}], "
                f"got {arr.shape}")
        return arr

    def process(self, media, token_ids: list[int]):
        items = media if isinstance(media, (list, tuple)) else [media]
        if isinstance(media, np.ndarray) and media.ndim == 4:
            items = [media]
        tiled = [self._prep(i) for i in items]
        counts = [t.shape[0] * self.tokens_per_tile for t in tiled]
        tid = self.image_token_id
        occurrences = [i for i, t in enumerate(token_ids) if t == tid]
        spans: list[tuple[int, int]] = []
        if len(occurrences) == sum(counts) and counts:
            expanded = list(token_ids)
            runs, run_start, prev = [], None, -2
            for i in occurrences + [-1]:
                if i != prev + 1:
                    if run_start is not None:
                        runs.append((run_start, prev - run_start + 1))
                    run_start = i
                prev = i
            ci = 0
            for off, ln in runs:
                while ln > 0:
                    spans.append((off, counts[ci]))
                    off += counts[ci]
                    ln -= counts[ci]
                    ci += 1
            if ci != len(counts):
                raise ValueError("placeholder runs do not tile images")
        elif len(occurrences) == len(counts):
            expanded, ci = [], 0
            for t in token_ids:
                if t == tid:
                    spans.append((len(expanded), counts[ci]))
                    expanded.extend([tid] * counts[ci])
                    ci += 1
                else:
                    expanded.append(t)
        else:
            raise ValueError(
                f"prompt has {len(occurrences)} image placeholders for "
                f"{len(counts)} images")
        return (np.concatenate(tiled, axis=0), expanded, spans, None)


class PixtralAdapter:
    """Pixtral / Mistral-3: variable-resolution images; the prompt carries
    rows of image tokens separated by [IMG_BREAK] and closed by [IMG_END]
    (reference pixtral.py / mistral3.py input mapping). Only image-token
    positions receive features, so spans are per-row.

    Accepts PIL / HWC arrays (resized per pixtral rules: fit longest side
    into ``image_size``, round patch counts up) or pre-processed dicts
    {"pixel_values": [[3,H,W], ...] or [N,3,H,W], "image_sizes": [(H,W)..]}.
    Unexpanded prompts need break/end ids — read from config attrs
    ``image_break_token_index`` / ``image_end_token_index`` when present;
    pre-expanded prompts (HF processor output) always work."""

    media_key = "image"

    def __init__(self, hf_config) -> None:
        self.hf = hf_config
        vc = hf_config.vision_config
        self.image_token_id = hf_config.image_token_index
        self.break_id = getattr(hf_config, "image_break_token_index", None)
        self.end_id = getattr(hf_config, "image_end_token_index", None)
        self.patch = vc.patch_size
        self.image_size = vc.image_size
        self.merge = getattr(hf_config, "spatial_merge_size", 1) \
            if getattr(hf_config, "model_type", "") == "mistral3" else 1
        self.image_mean = np.asarray(
            getattr(vc, "image_mean", (0.48145466, 0.4578275, 0.40821073)),
            np.float32)
        self.image_std = np.asarray(
            getattr(vc, "image_std", (0.26862954, 0.26130258, 0.27577711)),
            np.float32)

    def _prep_one(self, img) -> np.ndarray:
        """-> normalized [3, H, W] with H, W multiples of patch_size."""
        ps, S = self.patch, self.image_size
        arr = None
        if hasattr(img, "resize") and not isinstance(img, np.ndarray):
            w0, h0 = img.size
            ratio = max(h0 / S, w0 / S, 1.0)
            th = int(np.ceil(h0 / ratio / ps) * ps)
            tw = int(np.ceil(w0 / ratio / ps) * ps)
            img = img.convert("RGB").resize((tw, th), resample=3)
            arr = np.asarray(img).astype(np.float32) / 255.0
        else:
            arr = np.asarray(img, np.float32)
            if arr.ndim == 3 and arr.shape[0] == 3 and arr.shape[-1] != 3:
                # CHW pre-normalized passthrough
                if arr.shape[1] % ps or arr.shape[2] % ps:
                    raise ValueError("CHW pixel input dims must be patch "
                                     "multiples")
                return arr
            if arr.max() > 1.5:
                arr = arr / 255.0
            if arr.shape[0] % ps or arr.shape[1] % ps:
                raise ValueError(
                    f"HWC image dims must be multiples of {ps} "
                    "(resize first or pass PIL)")
        arr = (arr - self.image_mean) / self.image_std
        return arr.transpose(2, 0, 1)

    def process(self, media, token_ids: list[int]):
        if isinstance(media, dict):
            pvs = [np.asarray(p, np.float32)
                   for p in media["pixel_values"]]
            sizes = media.get("image_sizes")
            if sizes is not None:  # crop batch padding back off
                pvs = [p[:, :int(s[0]), :int(s[1])]
                       for p, s in zip(pvs, np.asarray(sizes))]
        else:
            items = media if isinstance(media, (list, tuple)) else [media]
            if isinstance(media, np.ndarray) and media.ndim == 4:
                items = list(media)
            pvs = [self._prep_one(i) for i in items]
        ps, m = self.patch, self.merge
        grids = [(p.shape[1] // ps, p.shape[2] // ps) for p in pvs]
        # Rows/cols of *feature* tokens (merged for Mistral-3).
        rc = [(h // m, w // m) for h, w in grids]
        tid = self.image_token_id
        occ = sum(1 for t in token_ids if t == tid)
        total = sum(r * c for r, c in rc)
        spans: list[tuple[int, int]] = []
        if occ == total and pvs:
            # Pre-expanded (HF processor): recover per-row spans from runs.
            expanded = list(token_ids)
            runs, run_start, prev = [], None, -2
            occurrences = [i for i, t in enumerate(token_ids) if t == tid]
            for i in occurrences + [-1]:
                if i != prev + 1:
                    if run_start is not None:
                        runs.append((run_start, prev - run_start + 1))
                    run_start = i
                prev = i
            spans = runs
        elif occ == len(pvs):
            if self.break_id is None or self.end_id is None:
                raise ValueError(
                    "unexpanded pixtral prompts need image_break/"
                    "image_end token ids (set image_break_token_index / "
                    "image_end_token_index on the config) — or pass the "
                    "HF-processor-expanded prompt")
            expanded = []
            ii = 0
            for t in token_ids:
                if t == tid:
                    r, c = rc[ii]
                    for _ in range(r):
                        spans.append((len(expanded), c))
                        expanded.extend([tid] * c)
                        expanded.append(self.break_id)
                    expanded[-1] = self.end_id
                    ii += 1
                else:
                    expanded.append(t)
        else:
            raise ValueError(
                f"prompt has {occ} image placeholders for {len(pvs)} "
                f"images ({total} feature tokens)")
        Hm = max(p.shape[1] for p in pvs)
        Wm = max(p.shape[2] for p in pvs)
        pv = np.zeros((len(pvs), 3, Hm, Wm), np.float32)
        for i, p in enumerate(pvs):
            pv[i, :, :p.shape[1], :p.shape[2]] = p
        return pv, expanded, spans, {"sizes": tuple(grids)}


class Qwen2VLAdapter:
    """Qwen2-VL family: native-resolution patch packing via the HF image
    processor; per-image token counts vary with the image grid
    (reference: qwen2_vl.py input mapping + Qwen2VLImageProcessor)."""

    media_key = "image"

    def __init__(self, hf_config) -> None:
        self.hf = hf_config
        vc = hf_config.vision_config
        self.image_token_id = getattr(hf_config, "image_token_id", None) \
            or getattr(hf_config, "image_token_index", None)
        self.merge = vc.spatial_merge_size
        from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
            Qwen2VLImageProcessor)
        self.proc = Qwen2VLImageProcessor(
            patch_size=vc.patch_size,
            temporal_patch_size=vc.temporal_patch_size,
            merge_size=vc.spatial_merge_size)

    def process(self, images: Any, token_ids: list[int]):
        """-> (pixel_values [N_patches, in_dim], expanded token_ids,
        per-image spans, {"grid_thw": [N_img, 3]})."""
        if isinstance(images, dict):
            # Pre-processed HF output passed through.
            pv = np.asarray(images["pixel_values"], np.float32)
            grid = np.asarray(images["image_grid_thw"], np.int64)
        else:
            if isinstance(images, np.ndarray) and images.ndim in (3, 4):
                images = [images] if images.ndim == 3 else list(images)
            elif not isinstance(images, (list, tuple)):
                images = [images]
            out = self.proc(images=images, return_tensors="np")
            pv = out["pixel_values"].astype(np.float32)
            grid = np.asarray(out["image_grid_thw"], np.int64)
        counts = [int(t * h * w) // (self.merge ** 2) for t, h, w in grid]
        tid = self.image_token_id
        occurrences = [i for i, t in enumerate(token_ids) if t == tid]
        spans: list[tuple[int, int]] = []
        if len(occurrences) == sum(counts) and counts:
            # Pre-expanded prompt: recover spans from placeholder runs.
            expanded = list(token_ids)
            run_start, prev = None, -2
            runs = []
            for i in occurrences + [-1]:
                if i != prev + 1:
                    if run_start is not None:
                        runs.append((run_start, prev - run_start + 1))
                    run_start = i
                prev = i
            # Runs may cover several images back-to-back; split by counts.
            ci = 0
            for off, ln in runs:
                while ln > 0:
                    spans.append((off, counts[ci]))
                    off += counts[ci]
                    ln -= counts[ci]
                    ci += 1
            if ci != len(counts) or any(n < 0 for _, n in spans):
                raise ValueError("placeholder runs do not tile images")
            return pv, expanded, spans, {"grid_thw": grid}
        if len(occurrences) != len(counts):
            raise ValueError(
                f"prompt has {len(occurrences)} image placeholders for "
                f"{len(counts)} images")
        expanded: list[int] = []
        ci = 0
        for t in token_ids:
            if t == tid:
                spans.append((len(expanded), counts[ci]))
                expanded.extend([tid] * counts[ci])
                ci += 1
            else:
                expanded.append(t)
        return pv, expanded, spans, {"grid_thw": grid}


class Qwen2_5OmniAdapter(Qwen2VLAdapter):
    """Qwen2.5-Omni thinker: images through the Qwen2.5-VL patch pipeline;
    audios through 128-mel features chunked at 2*n_window frames (token
    count = floor(sum(ceil(chunk/2)) / 2)). One media kind per request
    (audio+image interleaving in one prompt is a follow-up)."""

    media_keys = ("image", "audio")
    media_key = "image"

    def __init__(self, hf_config) -> None:
        super().__init__(hf_config)
        self.image_token_id = getattr(hf_config, "image_token_index",
                                      self.image_token_id)
        ac = hf_config.audio_config
        self.audio_token_id = getattr(hf_config, "audio_token_index", None)
        self.n_mels = ac.num_mel_bins
        self.a_window = getattr(ac, "n_window", 100)
        self._fe = None

    def _audio_feats(self, wav) -> tuple[np.ndarray, int]:
        if isinstance(wav, dict):
            f = np.asarray(wav["input_features"], np.float32)
            if f.ndim == 3:
                f = f[0]
            return f, int(wav.get("feature_len", f.shape[-1]))
        if self._fe is None:
            from transformers import WhisperFeatureExtractor
            self._fe = WhisperFeatureExtractor(feature_size=self.n_mels)
        if isinstance(wav, tuple):
            arr, sr = wav
            arr = np.asarray(arr, np.float32).reshape(-1)
            if sr != 16000:
                n_out = int(round(len(arr) * 16000 / sr))
                arr = np.interp(np.linspace(0, len(arr) - 1, n_out),
                                np.arange(len(arr)), arr).astype(np.float32)
        else:
            arr = np.asarray(wav, np.float32).reshape(-1)
        out = self._fe(arr, sampling_rate=16000, return_tensors="np",
                       return_attention_mask=True)
        feats = out["input_features"][0].astype(np.float32)
        real = int(out["attention_mask"][0].sum())
        return feats, real

    def _audio_tokens(self, L: int) -> int:
        win = 2 * self.a_window
        aftercnn = 0
        rem = L
        while rem > 0:
            c = min(win, rem)
            aftercnn += -(-c // 2)
            rem -= c
        return aftercnn // 2

    def process(self, media, token_ids: list[int]):
        if isinstance(media, dict) and "audio" in media and \
                media.get("audio") is not None:
            if media.get("image") is not None:
                raise NotImplementedError(
                    "Qwen2.5-Omni: image+audio in one prompt is a "
                    "follow-up; send them in separate requests")
            items = media["audio"]
            items = items if isinstance(items, list) else [items]
            pairs = [self._audio_feats(a) for a in items]
            counts = [self._audio_tokens(l) for _, l in pairs]
            tid = self.audio_token_id
            spans, expanded, ci = [], [], 0
            occurrences = [i for i, t in enumerate(token_ids) if t == tid]
            if len(occurrences) == sum(counts) and counts:
                expanded = list(token_ids)
                runs, run_start, prev = [], None, -2
                for i in occurrences + [-1]:
                    if i != prev + 1:
                        if run_start is not None:
                            runs.append((run_start, prev - run_start + 1))
                        run_start = i
                    prev = i
                for off, ln in runs:
                    while ln > 0:
                        spans.append((off, counts[ci]))
                        off += counts[ci]
                        ln -= counts[ci]
                        ci += 1
            elif len(occurrences) == len(counts):
                for t in token_ids:
                    if t == tid:
                        spans.append((len(expanded), counts[ci]))
                        expanded.extend([tid] * counts[ci])
                        ci += 1
                    else:
                        expanded.append(t)
            else:
                raise ValueError(
                    f"prompt has {len(occurrences)} audio placeholders "
                    f"for {len(counts)} audios")
            Lm = max(f.shape[-1] for f, _ in pairs)
            pv = np.zeros((len(pairs), self.n_mels, Lm), np.float32)
            for i, (f, l) in enumerate(pairs):
                pv[i, :, :f.shape[-1]] = f
            return pv, expanded, spans, {
                "audio_lens": tuple(l for _, l in pairs)}
        if isinstance(media, dict) and "image" in media:
            media = media["image"]
        return super().process(media, token_ids)


class Phi4MMAdapter:
    """Phi-4-multimodal: dynamic-HD image crops + conformer audio.
    Accepts the HF processor's outputs per modality:
    image: {"input_image_embeds": [N_img, crops, 3, S, S], "image_sizes":
    [N_img, 2], "image_attention_mask": [N_img, crops, g, g],
    "num_img_tokens": [N_img]}; audio: {"input_audio_embeds": [1, T, 80],
    "audio_embed_sizes": [n]}. Raw HWC images run a single-crop global
    path. Placeholders: 200010 (image) / 200011 (audio), one run per item
    or pre-expanded; image spans must precede audio spans or vice versa
    (no interleaving across modalities)."""

    media_keys = ("image", "audio")
    media_key = "image"

    def __init__(self, hf_config) -> None:
        self.hf = hf_config
        self.image_token_id = getattr(hf_config, "image_token_id", 200010)
        self.audio_token_id = getattr(hf_config, "audio_token_id", 200011)
        vc = getattr(hf_config, "vision_config", None)

        def get(c, k, d=None):
            return (c.get(k, d) if isinstance(c, dict)
                    else getattr(c, k, d)) if c is not None else d
        self.S = get(vc, "image_size", 448)
        self.grid = self.S // get(vc, "patch_size", 14)
        self.cg = self.grid // 2
        ap = getattr(hf_config, "audio_processor", None) or {}
        aconf = ap.get("config", ap) if isinstance(ap, dict) else ap
        tr = get(aconf, "time_reduction", 8)
        self.n_sample = int(np.round(np.log2(tr)))
        emb = getattr(hf_config, "embd_layer", None) or {}
        al = emb.get("audio_embd_layer", {}) if isinstance(emb, dict) else {}
        self.compression = al.get("compression_rate", tr)

    def _prep_image(self, media):
        if isinstance(media, dict):
            pv = np.asarray(media.get("input_image_embeds",
                                      media.get("pixel_values")), np.float32)
            if pv.ndim == 4:
                pv = pv[None]
            sizes = np.asarray(media["image_sizes"], np.int64).reshape(-1, 2)
            mask = np.asarray(media["image_attention_mask"], np.float32)
            mask = mask.reshape(pv.shape[0], pv.shape[1], self.grid,
                                self.grid)
            n_tok = media.get("num_img_tokens")
            if n_tok is None:
                n_tok = []
                for i in range(pv.shape[0]):
                    h, w = int(sizes[i, 0]) // self.S, \
                        int(sizes[i, 1]) // self.S
                    m = mask[i, 1:1 + h * w, ::2, ::2]
                    uh = int(m[:, :, 0].reshape(h, w, self.cg)[:, 0].sum())
                    n_tok.append(int(mask[i, :1 + h * w, ::2, ::2].sum())
                                 + uh + 1 + self.cg)
            return pv, sizes, mask, [int(x) for x in np.reshape(n_tok, -1)]
        arr = np.asarray(media, np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0
        arr = (arr - 0.5) / 0.5
        H, W = arr.shape[:2]
        ys = (np.arange(self.S) * H / self.S).astype(np.int64)
        xs = (np.arange(self.S) * W / self.S).astype(np.int64)
        crop = arr[ys][:, xs].transpose(2, 0, 1)
        pv = np.stack([crop, crop])[None]  # global + one sub crop
        sizes = np.asarray([[self.S, self.S]], np.int64)
        mask = np.ones((1, 2, self.grid, self.grid), np.float32)
        n_tok = [2 * self.cg * self.cg + 2 * self.cg + 1]
        return pv, sizes, mask, n_tok

    def _prep_audio(self, media):
        if not isinstance(media, dict):
            raise ValueError(
                "Phi-4-MM audio needs the processor's input_audio_embeds "
                "(raw-waveform mel extraction is not bundled)")
        mel = np.asarray(media.get("input_audio_embeds",
                                   media.get("audio_features")), np.float32)
        mel = mel.reshape(1, -1, mel.shape[-1])
        sizes = media.get("audio_embed_sizes")
        if sizes is not None:
            count = int(np.asarray(sizes).reshape(-1)[0])
        else:
            t = mel.shape[1]
            c = self.compression
            count = t // c + (1 if t % c else 0)
        return mel, count

    @staticmethod
    def _spans(token_ids, tid, counts):
        """Spans for one modality: existing runs or single-placeholder
        expansion. Returns (expanded_ids, spans)."""
        occurrences = [i for i, t in enumerate(token_ids) if t == tid]
        if len(occurrences) == sum(counts) and counts:
            spans, run_start, prev, runs = [], None, -2, []
            for i in occurrences + [-1]:
                if i != prev + 1:
                    if run_start is not None:
                        runs.append((run_start, prev - run_start + 1))
                    run_start = i
                prev = i
            ci = 0
            for off, ln in runs:
                while ln > 0:
                    spans.append((off, counts[ci]))
                    off += counts[ci]
                    ln -= counts[ci]
                    ci += 1
            if ci != len(counts) or any(n < 0 for _, n in spans):
                raise ValueError("placeholder runs do not tile items")
            return list(token_ids), spans
        if len(occurrences) != len(counts):
            raise ValueError(
                f"prompt has {len(occurrences)} placeholders ({tid}) for "
                f"{len(counts)} items")
        expanded, spans, ci = [], [], 0
        for t in token_ids:
            if t == tid:
                spans.append((len(expanded), counts[ci]))
                expanded.extend([tid] * counts[ci])
                ci += 1
            else:
                expanded.append(t)
        return expanded, spans

    def process(self, media: Any, token_ids: list[int]):
        if not isinstance(media, dict) or not (
                "image" in media or "audio" in media):
            media = {"image": media}
        extra: dict = {}
        pv = None
        img_counts: list[int] = []
        aud_count = None
        if media.get("image") is not None:
            pv, sizes, mask, img_counts = self._prep_image(media["image"])
            extra.update(image_sizes=sizes, image_attention_mask=mask)
        if media.get("audio") is not None:
            mel, aud_count = self._prep_audio(media["audio"])
            if pv is None:
                pv = mel
            else:
                extra["audio_features"] = mel
            extra["audio_embed_sizes"] = np.asarray([aud_count], np.int64)
        token_ids = list(token_ids)
        img_spans: list[tuple[int, int]] = []
        aud_spans: list[tuple[int, int]] = []
        if img_counts:
            token_ids, img_spans = self._spans(token_ids,
                                               self.image_token_id,
                                               img_counts)
        if aud_count is not None:
            token_ids, aud_spans = self._spans(token_ids,
                                               self.audio_token_id,
                                               [aud_count])
        order = []
        if img_spans:
            order.append(("image", img_spans[0][0]))
        if aud_spans:
            order.append(("audio", aud_spans[0][0]))
        order.sort(key=lambda x: x[1])
        if img_spans and aud_spans:
            lo, hi = order[0][0], order[1][0]
            last_lo = (img_spans if lo == "image" else aud_spans)[-1]
            first_hi = (img_spans if hi == "image" else aud_spans)[0]
            if last_lo[0] > first_hi[0]:
                raise ValueError("Phi-4-MM: image and audio placeholders "
                                 "must not interleave")
        extra["mm_order"] = tuple(kind for kind, _ in order)
        spans = sorted(img_spans + aud_spans)
        return pv, token_ids, spans, extra


class Florence2Adapter:
    """Florence-2: an encoder-decoder multimodal adapter — DaViT feature
    rows ([1 spatial-avg] + grid tokens by image_feature_source) are
    inserted as pad tokens at the START of the encoder prompt (reference
    florence2.py:851-871 PromptInsertion) and replaced with projected
    image rows at embed time. Accepts {"pixel_values": [1, 3, H, W]} or a
    raw HWC array (CLIP-normalized)."""

    media_key = "image"
    enc_dec_mm = True

    _MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
    _STD = np.asarray([0.229, 0.224, 0.225], np.float32)

    def __init__(self, hf_config) -> None:
        vc = hf_config.vision_config

        def get(c, k, d=None):
            return c.get(k, d) if isinstance(c, dict) else getattr(c, k, d)
        stride = 1
        for s in get(vc, "patch_stride"):
            stride *= int(s)
        self.total_stride = stride
        self.sources = list(get(vc, "image_feature_source",
                                ["spatial_avg_pool", "temporal_avg_pool"]))
        self.pad_token_id = getattr(hf_config, "pad_token_id", 1)

    def process_encoder(self, media: Any, enc_ids: list[int]):
        if isinstance(media, dict):
            pv = np.asarray(media["pixel_values"], np.float32)
            pv = pv.reshape((1,) + tuple(pv.shape[-3:]))
        else:
            arr = np.asarray(media, np.float32)
            if arr.max() > 1.5:
                arr = arr / 255.0
            arr = (arr - self._MEAN) / self._STD
            pv = arr.transpose(2, 0, 1)[None]
        side = pv.shape[-1] // self.total_stride
        n = sum(1 if s == "spatial_avg_pool" else side * side
                for s in self.sources)
        pad = self.pad_token_id
        if enc_ids[:n].count(pad) != n:
            enc_ids = [pad] * n + list(enc_ids)
        return enc_ids, {"images": pv}


class GraniteSpeechAdapter:
    """Granite Speech: log-mel features stacked in frame pairs
    ([1, T, 2*n_mels]); tokens per audio = ceil(T/window) *
    (window/downsample) with the first ``audio_embed_sizes`` kept
    (reference transformers GraniteSpeechFeatureExtractor). Accepts
    preprocessed dicts {"input_features": [1, T, 160], optional
    "audio_embed_sizes"} or raw waveforms (numpy reimplementation of the
    torchaudio mel pipeline: hann stft, HTK mels, log10, max-8 floor,
    /4 + 1, frame pairs)."""

    media_key = "audio"

    def __init__(self, hf_config) -> None:
        self.hf = hf_config
        self.audio_token_id = getattr(hf_config, "audio_token_index", None)
        self.window = hf_config.window_size
        self.nq = hf_config.window_size // hf_config.downsample_rate
        ec = hf_config.encoder_config
        self.input_dim = getattr(ec, "input_dim", 160)
        # torchaudio MelSpectrogram defaults used by the HF extractor.
        self.sr, self.n_fft, self.win, self.hop = 16000, 512, 400, 160
        self.n_mels = self.input_dim // 2

    def _mel(self, wav: np.ndarray) -> np.ndarray:
        wav = np.asarray(wav, np.float32).reshape(-1)
        pad = self.n_fft // 2
        x = np.pad(wav, (pad, pad), mode="reflect")
        win = np.hanning(self.win + 1)[:-1].astype(np.float32)
        wpad = (self.n_fft - self.win) // 2
        win = np.pad(win, (wpad, self.n_fft - self.win - wpad))
        n_frames = 1 + len(wav) // self.hop
        idx = np.arange(self.n_fft)[None] + \
            self.hop * np.arange(n_frames)[:, None]
        frames = x[idx] * win[None]
        spec = np.abs(np.fft.rfft(frames, self.n_fft, axis=-1)) ** 2
        # HTK mel filterbank, norm=None (torchaudio defaults).
        def hz2mel(f):
            return 2595.0 * np.log10(1.0 + f / 700.0)
        mels = np.linspace(0.0, hz2mel(self.sr / 2), self.n_mels + 2)
        freqs = 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
        fft_freqs = np.linspace(0, self.sr / 2, self.n_fft // 2 + 1)
        fb = np.zeros((self.n_fft // 2 + 1, self.n_mels), np.float64)
        for m in range(self.n_mels):
            lo, c, hi = freqs[m], freqs[m + 1], freqs[m + 2]
            up = (fft_freqs - lo) / (c - lo)
            down = (hi - fft_freqs) / (hi - c)
            fb[:, m] = np.maximum(0, np.minimum(up, down))
        logmel = np.log10(np.clip(spec @ fb, 1e-10, None))
        logmel = np.maximum(logmel, logmel.max() - 8.0) / 4 + 1
        if logmel.shape[0] % 2 == 1:
            logmel = logmel[:-1]
        return logmel.reshape(1, -1, 2 * self.n_mels).astype(np.float32)

    def _tokens(self, enc_len: int) -> int:
        return -(-enc_len // self.window) * self.nq

    def process(self, media: Any, token_ids: list[int]):
        if isinstance(media, (list, tuple)) and len(media) == 1:
            media = media[0]
        if isinstance(media, dict):
            feats = np.asarray(media["input_features"], np.float32)
            feats = feats.reshape(1, -1, self.input_dim)
            sizes = media.get("audio_embed_sizes")
            count = int(np.asarray(sizes).reshape(-1)[0]) if sizes is not \
                None else self._tokens(feats.shape[1])
        else:
            feats = self._mel(media)
            # raw_len//hop + 1 mel frames, floored to pairs (reference
            # _get_num_audio_features uses mel_length // 2).
            count = self._tokens((len(np.reshape(media, -1)) // self.hop
                                  + 1) // 2)
        tid = self.audio_token_id
        if tid is None:
            raise ValueError("Granite Speech serving needs "
                             "audio_token_index on the config")
        occurrences = [i for i, t in enumerate(token_ids) if t == tid]
        spans: list[tuple[int, int]] = []
        extra = {"audio_embed_sizes": np.asarray([count], np.int64)}
        if len(occurrences) == count and count:
            return feats, list(token_ids), [(occurrences[0], count)], extra
        if len(occurrences) != 1:
            raise ValueError(
                f"prompt has {len(occurrences)} audio placeholders; Granite "
                "Speech supports one audio per request")
        expanded: list[int] = []
        for t in token_ids:
            if t == tid:
                spans.append((len(expanded), count))
                expanded.extend([tid] * count)
            else:
                expanded.append(t)
        return feats, expanded, spans, extra


class MolmoAdapter:
    """Molmo: crops arrive preprocessed (the Molmo processor is remote
    code) as {"images"/"pixel_values": [T_crops, P, 3*ps*ps],
    "image_masks": [T_crops, P], "feat_is_patch": [T_crops,
    tokens_per_crop] bool, optional "img_patch_id"} with a PRE-EXPANDED
    prompt: pooled features scatter onto <im_patch> runs in order
    (reference molmo.py:1449-1501); im_start/im_col/im_end markers stay
    ordinary tokens."""

    media_key = "image"

    def __init__(self, hf_config) -> None:
        self.hf = hf_config
        self.image_token_id = getattr(hf_config, "img_patch_id", None)

    def process(self, media: Any, token_ids: list[int]):
        if not isinstance(media, dict):
            raise ValueError(
                "Molmo needs preprocessed inputs: pass the Molmo "
                "processor's images/image_masks/feat_is_patch plus the "
                "expanded prompt ids")
        pv = np.asarray(media.get("images", media.get("pixel_values")),
                        np.float32)
        if pv.ndim == 4:
            pv = pv.reshape((-1,) + tuple(pv.shape[-2:]))
        masks = media.get("image_masks")
        masks = np.ones(pv.shape[:2], np.float32) if masks is None \
            else np.asarray(masks, np.float32).reshape(pv.shape[:2])
        fis = np.asarray(media["feat_is_patch"]).astype(bool)
        tid = media.get("img_patch_id", self.image_token_id)
        if tid is None:
            raise ValueError("Molmo serving needs img_patch_id (pass it in "
                             "multi_modal_data or set it on the config)")
        total = int(fis.sum())
        occurrences = [i for i, t in enumerate(token_ids) if t == int(tid)]
        if len(occurrences) != total:
            raise ValueError(
                f"prompt has {len(occurrences)} <im_patch> tokens for "
                f"{total} pooled patch features")
        spans, run_start, prev = [], None, -2
        for i in occurrences + [-1]:
            if i != prev + 1:
                if run_start is not None:
                    spans.append((run_start, prev - run_start + 1))
                run_start = i
            prev = i
        return pv, list(token_ids), spans, {
            "image_masks": masks, "feat_is_patch": fis}


class Ovis2Adapter:
    """Ovis2: crops of S x S squares per image (global crop + optional
    r x c partition grid); every image position in the prompt is the
    image-pad token; per image the expansion is
    ``n_indicators + n_crops * T`` pads, T = (S/patch/hidden_stride)^2
    (reference processors/ovis2.py:232-262). Accepts preprocessed dicts
    {"pixel_values": [N_crops, 3, S, S], "grids": [[r, c], ...]} or raw
    HWC arrays (resized square, single crop)."""

    media_key = "image"

    def __init__(self, hf_config) -> None:
        vt = hf_config.visual_tokenizer_config
        bc = vt.backbone_config if not isinstance(vt, dict) \
            else vt["backbone_config"]

        def get(c, k, d=None):
            return c.get(k, d) if isinstance(c, dict) else getattr(c, k, d)
        self.S = get(bc, "image_size", 224)
        side = self.S // get(bc, "patch_size", 14)
        hs = int(get(vt, "hidden_stride", 1))
        self.tokens_per_crop = (-(-side // hs)) ** 2
        self.image_token_id = getattr(hf_config, "image_pad_token_id",
                                      151655)

    def _prep(self, item):
        if isinstance(item, dict):
            pv = np.asarray(item["pixel_values"], np.float32)
            if pv.ndim == 5:
                pv = pv.reshape((-1,) + tuple(pv.shape[-3:]))
            grids = item.get("grids")
            if grids is None:
                grids = [item.get("grid", (1, 1))]
            return pv, [tuple(int(x) for x in g) for g in np.reshape(
                np.asarray(grids, np.int64), (-1, 2))]
        arr = np.asarray(item, np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0
        arr = (arr - 0.5) / 0.5
        H, W = arr.shape[:2]
        ys = (np.arange(self.S) * H / self.S).astype(np.int64)
        xs = (np.arange(self.S) * W / self.S).astype(np.int64)
        return arr[ys][:, xs].transpose(2, 0, 1)[None], [(1, 1)]

    def _count(self, grid) -> int:
        r, c = grid
        crops = 1 if r * c <= 1 else 1 + r * c
        inds = 3 if r * c <= 1 else r * c + 2
        return inds + crops * self.tokens_per_crop

    def process(self, images: Any, token_ids: list[int]):
        if isinstance(images, dict) or (isinstance(images, np.ndarray)
                                        and images.ndim == 3):
            images = [images]
        elif not isinstance(images, (list, tuple)):
            images = [images]
        parts, grids = [], []
        for im in images:
            pv, gs = self._prep(im)
            parts.append(pv)
            grids.extend(gs)
        pv = np.concatenate(parts)
        counts = [self._count(g) for g in grids]
        tid = self.image_token_id
        occurrences = [i for i, t in enumerate(token_ids) if t == tid]
        spans: list[tuple[int, int]] = []
        extra = {"grids": np.asarray(grids, np.int64)}
        if len(occurrences) == sum(counts) and counts:
            # Pre-expanded prompt: recover spans from placeholder runs.
            expanded = list(token_ids)
            run_start, prev, runs = None, -2, []
            for i in occurrences + [-1]:
                if i != prev + 1:
                    if run_start is not None:
                        runs.append((run_start, prev - run_start + 1))
                    run_start = i
                prev = i
            ci = 0
            for off, ln in runs:
                while ln > 0:
                    spans.append((off, counts[ci]))
                    off += counts[ci]
                    ln -= counts[ci]
                    ci += 1
            if ci != len(counts) or any(n < 0 for _, n in spans):
                raise ValueError("placeholder runs do not tile images")
            return pv, expanded, spans, extra
        if len(occurrences) != len(counts):
            raise ValueError(
                f"prompt has {len(occurrences)} image placeholders for "
                f"{len(counts)} images")
        expanded: list[int] = []
        ci = 0
        for t in token_ids:
            if t == tid:
                spans.append((len(expanded), counts[ci]))
                expanded.extend([tid] * counts[ci])
                ci += 1
            else:
                expanded.append(t)
        return pv, expanded, spans, extra


class KimiVLAdapter:
    """Kimi-VL: MoonViT native-resolution patch packing; tokens per image
    = (h // kh) * (w // kw) with grid (h, w) in patch units (reference
    kimi_vl.py:146-183 get_num_image_tokens). Accepts preprocessed dicts
    {"pixel_values": [N, 3, ps, ps], "image_grid_hws": [N_img, 2]} or raw
    HWC arrays (0.5/0.5-normalized, padded to the merge-kernel grid)."""

    media_key = "image"

    def __init__(self, hf_config) -> None:
        vc = hf_config.vision_config
        self.patch = getattr(vc, "patch_size", 14)
        kh, kw = tuple(getattr(vc, "merge_kernel_size", (2, 2)))
        self.kernel = (int(kh), int(kw))
        self.in_token_limit = getattr(hf_config, "in_token_limit", 4096)
        self.image_token_id = getattr(hf_config,
                                      "media_placeholder_token_id", None)
        if self.image_token_id is None:
            raise ValueError("Kimi-VL serving needs "
                             "media_placeholder_token_id on the config")

    def _patchify(self, img: np.ndarray) -> tuple[np.ndarray, tuple]:
        """HWC image -> ([h*w, 3, ps, ps], (h, w)); pads to the merge
        grid, downscales if the patch count exceeds in_token_limit."""
        arr = np.asarray(img, np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0
        arr = (arr - 0.5) / 0.5
        ps, (kh, kw) = self.patch, self.kernel
        H, W = arr.shape[:2]
        if (H // ps) * (W // ps) > self.in_token_limit:
            scale = float(np.sqrt(self.in_token_limit
                                  / ((H // ps) * (W // ps))))
            nh, nw = max(int(H * scale), ps), max(int(W * scale), ps)
            ys = (np.arange(nh) * H / nh).astype(np.int64)
            xs = (np.arange(nw) * W / nw).astype(np.int64)
            arr = arr[ys][:, xs]
            H, W = nh, nw
        pad_h = (-H) % (kh * ps)
        pad_w = (-W) % (kw * ps)
        arr = np.pad(arr, ((0, pad_h), (0, pad_w), (0, 0)))
        h, w = arr.shape[0] // ps, arr.shape[1] // ps
        pv = arr.reshape(h, ps, w, ps, 3).transpose(0, 2, 4, 1, 3)
        return pv.reshape(h * w, 3, ps, ps), (h, w)

    def process(self, images: Any, token_ids: list[int]):
        ps = self.patch
        if isinstance(images, dict):
            pv = np.asarray(images["pixel_values"], np.float32)
            pv = pv.reshape(-1, 3, ps, ps)
            grid = np.asarray(images["image_grid_hws"], np.int64)
            grid = grid.reshape(-1, 2)
        else:
            if isinstance(images, np.ndarray) and images.ndim == 3:
                images = [images]
            elif not isinstance(images, (list, tuple)):
                images = [images]
            parts, hws = [], []
            for im in images:
                p, hw = self._patchify(np.asarray(im))
                parts.append(p)
                hws.append(hw)
            pv = np.concatenate(parts)
            grid = np.asarray(hws, np.int64)
        kh, kw = self.kernel
        counts = [int(h // kh) * int(w // kw) for h, w in grid]
        tid = self.image_token_id
        occurrences = [i for i, t in enumerate(token_ids) if t == tid]
        spans: list[tuple[int, int]] = []
        if len(occurrences) == sum(counts) and counts:
            # Pre-expanded prompt: recover spans from placeholder runs.
            expanded = list(token_ids)
            run_start, prev, runs = None, -2, []
            for i in occurrences + [-1]:
                if i != prev + 1:
                    if run_start is not None:
                        runs.append((run_start, prev - run_start + 1))
                    run_start = i
                prev = i
            ci = 0
            for off, ln in runs:
                while ln > 0:
                    spans.append((off, counts[ci]))
                    off += counts[ci]
                    ln -= counts[ci]
                    ci += 1
            if ci != len(counts) or any(n < 0 for _, n in spans):
                raise ValueError("placeholder runs do not tile images")
            return pv, expanded, spans, {"image_grid_hws": grid}
        if len(occurrences) != len(counts):
            raise ValueError(
                f"prompt has {len(occurrences)} image placeholders for "
                f"{len(counts)} images")
        expanded: list[int] = []
        ci = 0
        for t in token_ids:
            if t == tid:
                spans.append((len(expanded), counts[ci]))
                expanded.extend([tid] * counts[ci])
                ci += 1
            else:
                expanded.append(t)
        return pv, expanded, spans, {"image_grid_hws": grid}


_ADAPTERS = {
    "LlavaForConditionalGeneration": LlavaAdapter,
    "MantisForConditionalGeneration": LlavaAdapter,
    "LlavaNextForConditionalGeneration": LlavaNextAdapter,
    "LlavaNextVideoForConditionalGeneration": LlavaNextAdapter,
    "LlavaOnevisionForConditionalGeneration": LlavaNextAdapter,
    "Mistral3ForConditionalGeneration": PixtralAdapter,
    "PixtralForConditionalGeneration": PixtralAdapter,
    "Phi3VForCausalLM": Phi3VAdapter,
    "MllamaForConditionalGeneration": MllamaAdapter,
    "Llama4ForConditionalGeneration": Llama4Adapter,
    "Blip2ForConditionalGeneration": Blip2Adapter,
    "ChameleonForConditionalGeneration": ChameleonAdapter,
    "AyaVisionForConditionalGeneration": AyaVisionAdapter,
    "MiniMaxVL01ForConditionalGeneration": LlavaAdapter,
    "AriaForConditionalGeneration": AriaAdapter,
    "MiniCPMV": MiniCPMVAdapter,
    "MiniCPMO": MiniCPMVAdapter,
    "DeepseekVLV2ForCausalLM": DeepseekVL2Adapter,
    "GLM4VForCausalLM": GLM4VAdapter,
    "QwenVLForConditionalGeneration": QwenVL1Adapter,
    "Qwen2_5OmniModel": Qwen2_5OmniAdapter,
    "Qwen2_5OmniForConditionalGeneration": Qwen2_5OmniAdapter,
    "Qwen2_5OmniThinkerForConditionalGeneration": Qwen2_5OmniAdapter,
    "InternVLChatModel": InternVLAdapter,
    "NVLM_D": InternVLAdapter,
    "H2OVLChatModel": InternVLAdapter,
    "SkyworkR1VChatModel": InternVLAdapter,
    "PaliGemmaForConditionalGeneration": PaliGemmaAdapter,
    "WhisperForConditionalGeneration": WhisperAdapter,
    "Qwen2VLForConditionalGeneration": Qwen2VLAdapter,
    "Qwen2_5_VLForConditionalGeneration": Qwen2VLAdapter,
    "Gemma3ForConditionalGeneration": Gemma3Adapter,
    "Qwen2AudioForConditionalGeneration": Qwen2AudioAdapter,
    "UltravoxModel": UltravoxAdapter,
    "Idefics3ForConditionalGeneration": Idefics3Adapter,
    "SmolVLMForConditionalGeneration": Idefics3Adapter,
    "FuyuForCausalLM": FuyuAdapter,
    "KimiVLForConditionalGeneration": KimiVLAdapter,
    "Ovis2ForConditionalGeneration": Ovis2Adapter,
    "Ovis": Ovis2Adapter,
    "MolmoForCausalLM": MolmoAdapter,
    "GraniteSpeechForConditionalGeneration": GraniteSpeechAdapter,
    "Florence2ForConditionalGeneration": Florence2Adapter,
    "Phi4MMForCausalLM": Phi4MMAdapter,
}


def get_mm_adapter(hf_config) -> Optional[object]:
    archs = getattr(hf_config, "architectures", None) or []
    pixtral_tower = getattr(getattr(hf_config, "vision_config", None),
                            "model_type", None) == "pixtral"
    for a in archs:
        if a == "LlavaForConditionalGeneration" and pixtral_tower:
            return PixtralAdapter(hf_config)
        if a == "QWenLMHeadModel" and getattr(hf_config, "visual", None):
            return QwenVL1Adapter(hf_config)
        cls = _ADAPTERS.get(a)
        if cls is not None:
            return cls(hf_config)
    return None


def register_mm_adapter(arch: str, cls) -> None:
    _ADAPTERS[arch] = cls
