#!/usr/bin/env python3
"""Train the langid char-n-gram NB artifact offline and pickle it
as package data under xjs/pipeline/artifacts/ (VERDICT r3 #3;
moved out of tests/data in r5 so --py-files deployments ship it).

The training corpus is deterministic synthetic prose per language,
built from each language's stopword profile plus a fixed content
vocabulary, mixed with a seeded RNG — no external data, rebuildable
byte-for-byte.  ~200 docs/lang is plenty for a 4-way char-trigram NB.
"""

from __future__ import annotations

import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from xjs.pipeline.model_artifact import ARTIFACT_DIR, save, train  # noqa: E402

OUT_PATH = os.path.join(ARTIFACT_DIR, "langid_cngram.pkl")
from xjs.pipeline.text import LANG_PROFILES  # noqa: E402

CONTENT = {
    "en": ["house", "water", "morning", "people", "question", "window",
           "market", "evening", "letter", "mountain", "children", "story"],
    "de": ["haus", "wasser", "morgen", "leute", "frage", "fenster",
           "markt", "abend", "brief", "berg", "kinder", "geschichte"],
    "fr": ["maison", "eau", "matin", "gens", "question", "fenetre",
           "marche", "soir", "lettre", "montagne", "enfants", "histoire"],
    "es": ["casa", "agua", "manana", "gente", "pregunta", "ventana",
           "mercado", "tarde", "carta", "montana", "ninos", "historia"],
}


def synth_corpus(docs_per_lang: int = 200, doc_len: int = 25, seed: int = 7):
    rng = random.Random(seed)
    samples = []
    for lang, stop in LANG_PROFILES:
        vocab = stop + CONTENT[lang]
        for _ in range(docs_per_lang):
            words = [rng.choice(vocab) for _ in range(doc_len)]
            samples.append((lang, " ".join(words)))
    return samples


def main():
    samples = synth_corpus()
    model = train(samples)
    # held-out sanity: fresh seed, same generator
    held = synth_corpus(docs_per_lang=50, seed=99)
    from xjs.pipeline.model_artifact import predict_series
    import pandas as pd

    preds = predict_series(model, pd.Series([t for _, t in held]))
    acc = sum(p == lang for p, (lang, _) in zip(preds, held)) / len(held)
    print(f"held-out accuracy: {acc:.3f} over {len(held)} docs")
    assert acc >= 0.95, "artifact failed held-out sanity"
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    save(model, OUT_PATH)
    print(f"wrote {OUT_PATH} ({os.path.getsize(OUT_PATH)} bytes)")


if __name__ == "__main__":
    main()
