"""Corpus preprocessing: raw speech -> the on-disk training layout.

TPU-native counterpart of the reference's Emilia pipeline (reference:
examples/data_preprocess/prepare_emilia_en.py): filtering (language
allow-list, id blocklist, bad substrings, repetition detector, 0.1-30 s
duration gates), XCodec2 tokenization, md5-sharded writes of
``text/ xcodec2_1cb/ manifest_final/``, manifest-based resume, and
same-speaker ``neighbors/`` generation (duration-diff distance, strided
subsampling).

Where the reference parallelizes encoding with one thread + model per CUDA
GPU (prepare_emilia_en.py:667-780 ``EncoderPool``), here batches of
fixed-bucket waveforms are encoded by ONE jitted SPMD program sharded over
the mesh's data axis — every TPU device encodes its shard of each batch.
"""

from __future__ import annotations

import hashlib
import logging
import os
import re
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger(__name__)

MIN_DURATION_SEC = 0.1
MAX_DURATION_SEC = 30.0

_ID_SAFE_RE = re.compile(r"[^A-Za-z0-9_\-./]")

DEFAULT_BAD_SUBSTRINGS = ("http://", "https://", "www.")


def sanitize_utt_id(raw_id: str) -> str:
    return _ID_SAFE_RE.sub("_", str(raw_id))


def normalize_text(text: str) -> str:
    return " ".join(str(text).lstrip().split())


def repetition_found(text: str, length: int = 4, tolerance: int = 10) -> bool:
    """Over-repetition of short substrings marks junk transcripts
    (reference prepare_emilia_en.py:369-378)."""
    if length <= 0 or len(text) < length:
        return False
    counts: Dict[str, int] = defaultdict(int)
    for i in range(len(text) - length + 1):
        counts[text[i:i + length]] += 1
        if counts[text[i:i + length]] > tolerance:
            return True
    return False


@dataclass
class Sample:
    utt_id: str
    text: str
    wav: np.ndarray          # float32 at encode sample rate
    speaker: str = ""
    language: str = ""
    duration_sec: float = 0.0


@dataclass
class PreprocessConfig:
    out_dir: str = "prepared"
    split: str = "train"
    valid_fraction: float = 0.002
    languages: Tuple[str, ...] = ()   # empty = allow all
    blocklist: Tuple[str, ...] = ()
    bad_substrings: Tuple[str, ...] = DEFAULT_BAD_SUBSTRINGS
    repetition_length: int = 4
    repetition_tolerance: int = 10
    encode_batch: int = 16
    encodec_sr: int = 50
    overwrite: bool = False
    max_neighbors_per_utt: Optional[int] = 64
    seed: int = 0


def ensure_dirs(base: str) -> Dict[str, str]:
    dirs = {
        "text": os.path.join(base, "text"),
        "codes": os.path.join(base, "xcodec2_1cb"),
        "manifest": os.path.join(base, "manifest_final"),
        "neighbors": os.path.join(base, "neighbors"),
    }
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    return dirs


def write_outputs(dirs: Dict[str, str], split: str, utt_id: str,
                  tokens: np.ndarray, text: str, overwrite: bool) -> int:
    """md5-sharded text/codes/manifest write
    (reference prepare_emilia_en.py:306-344)."""
    shard = hashlib.md5(utt_id.encode()).hexdigest()[:2]
    tdir = os.path.join(dirs["text"], shard)
    cdir = os.path.join(dirs["codes"], shard)
    os.makedirs(tdir, exist_ok=True)
    os.makedirs(cdir, exist_ok=True)
    tpath = os.path.join(tdir, f"{utt_id}.txt")
    cpath = os.path.join(cdir, f"{utt_id}.txt")
    if not overwrite and (os.path.exists(tpath) or os.path.exists(cpath)):
        raise FileExistsError(f"outputs exist for {utt_id}")
    with open(tpath, "w", encoding="utf-8") as f:
        f.write(text.strip() + "\n")
    tokens = np.asarray(tokens).reshape(-1)
    with open(cpath, "w") as f:
        f.write(" ".join(str(int(t)) for t in tokens) + "\n")
    with open(os.path.join(dirs["manifest"], f"{split}.txt"), "a") as f:
        f.write(f"{shard}/{utt_id}\t{len(tokens)}\n")
    return len(tokens)


def load_done_ids(dirs: Dict[str, str]) -> set:
    """Resume support: utt ids already present in any manifest
    (reference prepare_emilia_en.py:947-976)."""
    done = set()
    mdir = dirs["manifest"]
    if os.path.isdir(mdir):
        for fn in os.listdir(mdir):
            with open(os.path.join(mdir, fn)) as f:
                for line in f:
                    utt = line.split("\t")[0].split("/")[-1].strip()
                    if utt:
                        done.add(utt)
    return done


def sample_filter(cfg: PreprocessConfig, s: Sample,
                  encode_sr: int) -> Optional[str]:
    """Returns a rejection reason or None (accepted)."""
    if cfg.languages and s.language and s.language.lower() not in cfg.languages:
        return "language"
    if s.utt_id in cfg.blocklist:
        return "blocklist"
    text = normalize_text(s.text)
    if not text:
        return "empty_text"
    low = text.lower()
    if any(b in low for b in cfg.bad_substrings):
        return "bad_substring"
    if repetition_found(text, cfg.repetition_length, cfg.repetition_tolerance):
        return "repetition"
    dur = s.duration_sec or len(s.wav) / encode_sr
    if dur < MIN_DURATION_SEC or dur > MAX_DURATION_SEC:
        return "duration"
    return None


@dataclass
class SampleRecord:
    utt_id: str
    speaker: str
    duration_sec: float
    split: str


def prepare(
    samples: Iterable[Sample],
    audio_tokenizer,
    cfg: PreprocessConfig,
) -> List[SampleRecord]:
    """Filter + batch-encode + write. ``audio_tokenizer`` is a
    codec.audio_tokenizer.AudioTokenizer (its encode() is jitted/bucketed and
    shards across all local devices when params are mesh-sharded)."""
    dirs = ensure_dirs(cfg.out_dir)
    done = load_done_ids(dirs)
    encode_sr = audio_tokenizer.encode_sample_rate
    rng = np.random.default_rng(cfg.seed)

    records: List[SampleRecord] = []
    stats: Dict[str, int] = defaultdict(int)
    buf: List[Sample] = []

    def flush():
        if not buf:
            return
        max_len = max(len(s.wav) for s in buf)
        wavs = np.zeros((len(buf), max_len), np.float32)
        for i, s in enumerate(buf):
            wavs[i, : len(s.wav)] = s.wav
        codes = audio_tokenizer.encode(wavs)  # [B, T, 1]
        for i, s in enumerate(buf):
            t = int(len(s.wav) // np.prod(audio_tokenizer.cfg.acoustic_cfg.ratios))
            toks = codes[i, : max(t, 1), 0]
            split = s_split[i]
            write_outputs(dirs, split, s.utt_id, toks, normalize_text(s.text),
                          cfg.overwrite)
            records.append(SampleRecord(
                utt_id=f"{hashlib.md5(s.utt_id.encode()).hexdigest()[:2]}/{s.utt_id}",
                speaker=s.speaker,
                duration_sec=s.duration_sec or len(s.wav) / encode_sr,
                split=split,
            ))
            stats["written"] += 1
        buf.clear()
        s_split.clear()

    s_split: List[str] = []
    for s in samples:
        s.utt_id = sanitize_utt_id(s.utt_id)
        if s.utt_id in done:
            stats["resumed"] += 1
            continue
        reason = sample_filter(cfg, s, encode_sr)
        if reason:
            stats[reason] += 1
            continue
        split = cfg.split
        if cfg.valid_fraction > 0 and rng.random() < cfg.valid_fraction:
            split = "valid"
        buf.append(s)
        s_split.append(split)
        if len(buf) >= cfg.encode_batch:
            flush()
    flush()
    log.info("preprocess stats: %s", dict(stats))

    generate_neighbors(records, dirs["neighbors"],
                       cfg.max_neighbors_per_utt, cfg.seed)
    return records


def generate_neighbors(records: Sequence[SampleRecord], out_dir: str,
                       max_per_utt: Optional[int], seed: int = 0) -> None:
    """Same-speaker neighbor lists with duration-diff distance
    (reference prepare_emilia_en.py:1293-1483)."""
    rng = np.random.default_rng(seed)
    groups: Dict[Tuple[str, str], List[SampleRecord]] = defaultdict(list)
    for r in records:
        groups[(r.split, r.speaker)].append(r)
    for g in groups.values():
        g.sort(key=lambda r: r.utt_id)

    for r in records:
        neighbors = [n for n in groups[(r.split, r.speaker)]
                     if n.utt_id != r.utt_id]
        path = os.path.join(out_dir, f"{r.utt_id}.txt")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        if not neighbors:
            open(path, "a").close()
            continue
        neighbors.sort(key=lambda n: abs(n.duration_sec - r.duration_sec))
        if max_per_utt is not None and len(neighbors) > max_per_utt:
            stride = len(neighbors) / float(max_per_utt)
            sampled = []
            for i in range(max_per_utt):
                pos = int(rng.uniform(i * stride, (i + 1) * stride))
                sampled.append(neighbors[min(pos, len(neighbors) - 1)])
            neighbors = sampled
        with open(path, "w", encoding="utf-8") as f:
            for n in neighbors:
                dist = abs(n.duration_sec - r.duration_sec)
                f.write(f"{n.utt_id}.txt\t{dist:.3f}\t{n.duration_sec:.3f}\n")


# ---------------------------------------------------------------------------
# input adapters
# ---------------------------------------------------------------------------


def iter_wav_folder(folder: str, encode_sr: int) -> Iterator[Sample]:
    """Simple adapter: folder of <utt>.wav + <utt>.txt pairs."""
    from ..inference import audio_io

    for fn in sorted(os.listdir(folder)):
        if not fn.endswith(".wav"):
            continue
        utt = fn[:-4]
        txt = os.path.join(folder, utt + ".txt")
        if not os.path.isfile(txt):
            continue
        wav = audio_io.load_for_encode(os.path.join(folder, fn), encode_sr)
        with open(txt, encoding="utf-8") as f:
            text = f.read().strip()
        speaker = utt.rsplit("_", 1)[0]
        yield Sample(utt_id=utt, text=text, wav=wav, speaker=speaker,
                     duration_sec=len(wav) / encode_sr)


def iter_hf_dataset(name_or_path: str, encode_sr: int,
                    split: str = "train", streaming: bool = True,
                    text_column: str = "text",
                    speaker_column: str = "speaker",
                    audio_column: str = "audio",
                    id_column: str = "id") -> Iterator[Sample]:
    """HF datasets adapter (Emilia-YODAS-style tars,
    reference prepare_emilia_en.py:791-818)."""
    from datasets import load_dataset

    from ..inference.audio_io import resample

    ds = load_dataset(name_or_path, split=split, streaming=streaming)
    for ex in ds:
        audio = ex.get(audio_column) or {}
        arr = np.asarray(audio.get("array"), np.float32)
        sr = int(audio.get("sampling_rate", encode_sr))
        if arr.ndim > 1:
            arr = arr.mean(axis=-1)
        if sr != encode_sr:
            arr = resample(arr, sr, encode_sr)
        meta = ex.get("json") or ex
        yield Sample(
            utt_id=str(ex.get(id_column) or meta.get("id") or ""),
            text=str(meta.get(text_column) or ""),
            wav=arr,
            speaker=str(meta.get(speaker_column) or ""),
            language=str(meta.get("language") or ""),
            duration_sec=float(meta.get("duration") or len(arr) / encode_sr),
        )
