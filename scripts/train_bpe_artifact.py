#!/usr/bin/env python3
"""Train the byte-level BPE artifact offline and pickle it as package
data under xjs/pipeline/artifacts/ (r4 verdict gap #1: real token
billing).  Same contract as train_langid_artifact.py: the training
corpus is deterministic synthetic web-ish prose (seeded RNG, no
external data), so the committed artifact is rebuildable
byte-for-byte and tests pin it by retraining.

The corpus mixes the langid vocabularies with web furniture —
punctuation runs, numbers, URL-ish fragments, a little multi-byte
unicode — so the learned merges cover the symbol classes the
pre-tokenizer emits ([a-zA-Z]+ | [0-9]+ | single non-alnum chars).
"""

from __future__ import annotations

import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from xjs.pipeline.bpe import encode_text, ranks_of, train_bpe  # noqa: E402
from xjs.pipeline.model_artifact import ARTIFACT_DIR, save  # noqa: E402
from xjs.pipeline.text import LANG_PROFILES  # noqa: E402

OUT_PATH = os.path.join(ARTIFACT_DIR, "bpe_small.pkl")

CONTENT = [
    "house", "water", "morning", "people", "question", "window",
    "market", "evening", "letter", "mountain", "children", "story",
    "training", "tokens", "corpus", "quality", "document", "language",
    "haus", "wasser", "fenster", "geschichte", "maison", "montagne",
    "pregunta", "historia", "café", "naïve", "über",
]
PUNCT = [".", ",", "!", "?", ";", ":", "-", "(", ")", '"', "'"]


def synth_corpus(n_docs: int = 400, doc_len: int = 40, seed: int = 11):
    rng = random.Random(seed)
    vocab = CONTENT + [w for _, stop in LANG_PROFILES for w in stop]
    docs = []
    for _ in range(n_docs):
        words = []
        for _ in range(doc_len):
            r = rng.random()
            if r < 0.72:
                words.append(rng.choice(vocab))
            elif r < 0.82:
                words.append(str(rng.randrange(0, 100000)))
            elif r < 0.92:
                words.append(rng.choice(vocab) + rng.choice(PUNCT))
            else:
                words.append(
                    "https://www.example%d.com/page-%d"
                    % (rng.randrange(50), rng.randrange(1000))
                )
        docs.append(" ".join(words))
    return docs


def main():
    docs = synth_corpus()
    model = train_bpe(docs, n_merges=1000)
    print(f"trained {len(model['merges'])} merges")
    # sanity: merges actually compress the held-out stream
    held = synth_corpus(n_docs=50, seed=99)
    ranks = ranks_of(model)
    n_tok = sum(len(encode_text(t, ranks)) for t in held)
    n_bytes = sum(
        len(w.encode("utf-8"))
        for t in held
        for w in __import__("xjs.pipeline.bpe", fromlist=["pre_tokens"]).pre_tokens(t)
    )
    ratio = n_tok / n_bytes
    print(f"held-out tokens/byte: {ratio:.3f} ({n_tok} tokens / {n_bytes} bytes)")
    assert ratio < 0.5, "artifact failed held-out compression sanity"
    save(model, OUT_PATH)
    print(f"wrote {OUT_PATH} ({os.path.getsize(OUT_PATH)} bytes)")


if __name__ == "__main__":
    main()
