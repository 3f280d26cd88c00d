"""Host-side story preprocessing protocol (pure numpy — no torch).

Re-implements the reference dataset semantics (`mydatasets/flintstones.py`,
`mydatasets/pororosv.py`) with the TPU-native NHWC/(b, f, ...) layouts:

  * CLIP image preprocessing (resize-shortest-224 bicubic, center crop,
    CLIP mean/std) == `CLIPImageProcessor()` defaults.
  * target images: resize to size^2, scale to [-1, 1]   (flintstones.py:76-81)
  * known-prefix masking: length ~ U{0..4}; `source` = first L real frames +
    black; per-frame mask maps (size/8)^2 all-ones/zeros; white/black CLIP
    mask images                                          (flintstones.py:151-199)
  * captions lowercased, 10% dropped to "" for CFG, tokenized to
    max_length 91/85 with truncation disabled            (flintstones.py:206-226)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from rcdms_tpu.configs import DatasetConfig

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _resize(img: np.ndarray, size_hw, filt=None) -> np.ndarray:
    """PIL resize. Default BICUBIC (transformers' CLIP resampling);
    pixel_preprocess passes BILINEAR (torchvision's transforms.Resize
    default)."""
    from PIL import Image

    pil = Image.fromarray(img)
    return np.asarray(pil.resize((size_hw[1], size_hw[0]),
                                 Image.BICUBIC if filt is None else filt))


def clip_preprocess(img: np.ndarray, size: int = 224) -> np.ndarray:
    """uint8 HWC RGB -> CLIP-normalized float32 (size, size, 3)."""
    h, w = img.shape[:2]
    scale = size / min(h, w)
    nh, nw = round(h * scale), round(w * scale)
    img = _resize(img, (nh, nw))
    top, left = (nh - size) // 2, (nw - size) // 2
    img = img[top:top + size, left:left + size]
    img = img.astype(np.float32) / 255.0
    return (img - CLIP_MEAN) / CLIP_STD


def pixel_preprocess(img: np.ndarray, size: int = 512) -> np.ndarray:
    """uint8 HWC RGB -> [-1, 1] float32 (size, size, 3): square BILINEAR
    resize (not aspect-preserving), matching the reference's
    `transforms.Resize([s, s])` whose torchvision default interpolation is
    InterpolationMode.BILINEAR (`mydatasets/flintstones.py:76-81`). CLIP
    preprocessing keeps BICUBIC (the CLIPImageProcessor default)."""
    from PIL import Image

    img = _resize(img, (size, size), Image.BILINEAR)
    return img.astype(np.float32) / 127.5 - 1.0


def black_image(size: int) -> np.ndarray:
    return np.zeros((size, size, 3), np.uint8)


def white_image(size: int) -> np.ndarray:
    return np.full((size, size, 3), 255, np.uint8)


_CONST_CACHE: Dict[tuple, np.ndarray] = {}


def _cached_const(kind: str, size: int, csize: int) -> np.ndarray:
    """Per-(size, csize) cache of the black/white protocol constants: the
    reference recomputes three PIL resizes + normalizes per story
    (`flintstones.py:159-199`); these never change, so compute once (the
    C++ feeder does the same per batch, `native/story_feeder.cpp:286-292`).
    Returned arrays are read-only — callers stack/copy them."""
    key = (kind, size, csize)
    out = _CONST_CACHE.get(key)
    if out is None:
        if kind == "black_px":
            out = pixel_preprocess(black_image(size), size)
        elif kind == "black_cl":
            out = clip_preprocess(black_image(size), csize)
        else:
            out = clip_preprocess(white_image(size), csize)
        out.flags.writeable = False
        _CONST_CACHE[key] = out
    return out


@dataclass
class StoryTokenizer:
    """CLIP tokenizer wrapper: adds the dataset character tokens and pads to
    the dataset max length with truncation disabled (the reference table at
    `train_stage1.py:82-85`). Falls back to a deterministic hash tokenizer
    when no pretrained tokenizer files are available (tests/benches)."""

    cfg: DatasetConfig
    tokenizer_path: Optional[str] = None

    def __post_init__(self):
        self._tok = None
        if self.tokenizer_path is not None:
            from transformers import CLIPTokenizer

            self._tok = CLIPTokenizer.from_pretrained(self.tokenizer_path)
            self._tok.add_tokens(list(self.cfg.new_tokens))

    @property
    def eos_token_id(self) -> int:
        return self._tok.eos_token_id if self._tok is not None else 49407

    def __call__(self, texts: Sequence[str]) -> Dict[str, np.ndarray]:
        max_len = self.cfg.max_text_len
        if self._tok is not None:
            # tokenize WITHOUT return_tensors: with truncation=False an
            # over-length caption makes the padded batch ragged and HF's
            # array conversion raises before any clamp can run (the
            # reference, which passes the same args with return_tensors=
            # 'pt' — flintstones.py:218-226 — would crash on such input);
            # pad/clamp manually instead
            enc = self._tok(list(texts), padding=False,
                            truncation=False)["input_ids"]
            pad_id = (self._tok.pad_token_id
                      if self._tok.pad_token_id is not None
                      else self.eos_token_id)
            ids = np.full((len(texts), max_len), pad_id, np.int32)
            mask = np.zeros((len(texts), max_len), bool)
            for i, seq in enumerate(enc):
                if len(seq) > max_len:
                    seq = list(seq[:max_len])
                    seq[-1] = self.eos_token_id
                ids[i, :len(seq)] = seq
                mask[i, :len(seq)] = True
            return {"input_ids": ids, "attention_mask": mask}
        # hash fallback: bos, per-word ids, eos, pad-with-eos (CLIP pads
        # with eos token by default). crc32, NOT builtin hash(): the
        # builtin is salted per process (PYTHONHASHSEED), which would make
        # 'deterministic' ids differ across runs and hosts
        import zlib

        bos, eos = 49406, 49407
        ids = np.full((len(texts), max_len), eos, np.int32)
        mask = np.zeros((len(texts), max_len), bool)
        for i, t in enumerate(texts):
            words = t.lower().split()[: max_len - 2]
            row = [bos] + [zlib.crc32(w.encode()) % 49000
                           for w in words] + [eos]
            ids[i, : len(row)] = np.asarray(row, np.int32)
            mask[i, : len(row)] = True
        return {"input_ids": ids, "attention_mask": mask}


def build_story_example(
    frames: Sequence[np.ndarray],
    captions: Sequence[str],
    known_length: int,
    tokenizer: StoryTokenizer,
    tokenizer_uncond: Optional[StoryTokenizer] = None,
    cfg: Optional[DatasetConfig] = None,
    text_drop_mask: Optional[Sequence[bool]] = None,
) -> Dict[str, np.ndarray]:
    """One story -> the full training/inference example dict, frames-first
    layouts. `frames`: list of f uint8 HWC images; `known_length` in [0, f].

    Keys (f = num frames, s = image size, c = clip size):
      target        (f, s, s, 3)  [-1, 1]
      source        (f, s, s, 3)  known frames + black
      reference_clip(f, c, c, 3)  CLIP-processed real frames (all)
      source_clip   (f, c, c, 3)  CLIP-processed known + black
      mask_clip     (f, c, c, 3)  CLIP-processed white(known)/black
      mask_label    (f, s/8, s/8, 1) {0,1}
      input_ids     (f, T) int32 / text_mask (f, T) bool
      frame_known   (f,) bool
    """
    cfg = cfg or DatasetConfig()
    f = len(frames)
    size, csize = cfg.image_size, cfg.clip_size
    m = size // 8

    black_px = _cached_const("black_px", size, csize)
    black_cl = _cached_const("black_cl", size, csize)
    white_cl = _cached_const("white_cl", size, csize)

    target = np.stack([pixel_preprocess(fr, size) for fr in frames])
    reference_clip = np.stack([clip_preprocess(fr, csize) for fr in frames])

    known = np.arange(f) < known_length
    source = np.stack([target[i] if known[i] else black_px for i in range(f)])
    source_clip = np.stack([reference_clip[i] if known[i] else black_cl
                            for i in range(f)])
    mask_clip = np.stack([white_cl if known[i] else black_cl
                          for i in range(f)])
    mask_label = known.astype(np.float32)[:, None, None, None]
    mask_label = np.broadcast_to(mask_label, (f, m, m, 1)).copy()

    caps: List[str] = [c.lower() for c in captions]
    if text_drop_mask is not None:
        caps = ["" if d else c for c, d in zip(caps, text_drop_mask)]
    toks = tokenizer(caps)

    out = {
        "target": target,
        "source": source,
        "reference_clip": reference_clip,
        "source_clip": source_clip,
        "mask_clip": mask_clip,
        "mask_label": mask_label,
        "input_ids": toks["input_ids"],
        "text_mask": toks["attention_mask"],
        "frame_known": known,
    }
    if tokenizer_uncond is not None:
        utoks = tokenizer_uncond([""] * f)
        out["input_ids_uncond"] = utoks["input_ids"]
        out["text_mask_uncond"] = utoks["attention_mask"]
    return out


def collate(examples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack example dicts to a batch: every key gains a leading batch dim
    (unlike the reference Collate_fn, input_ids keep an explicit (b, f, T)
    shape rather than being flattened to (b*f, T))."""
    return {k: np.stack([e[k] for e in examples]) for k in examples[0]}
