"""Cross-checks that share NO code with the implementations they validate.

The literal-oracle pattern (oracles.py) proves distributed-plumbing parity by
recomputing expected rows from the same pure functions the UDFs wrap — it
cannot catch a bug inside those shared functions. These two tests close that
gap where external ground truth exists:

- MinHash: the Jaccard ESTIMATE from ``minhash_signature_batch`` is compared
  against an exact brute-force Jaccard computed with plain Python byte
  slicing + set algebra (no shingle-hash code, no numpy) — the estimator
  must land within MinHash's statistical error band.
- Language-ID: ``classify_text`` is scored on a held-out labeled fixture of
  sentences written for this test (none appear in the training corpus).
"""

import numpy as np

from dataqualityassistant_spark.functions.langid import classify_text
from dataqualityassistant_spark.ops.dedup import minhash_signature_batch


def _exact_jaccard(a: str, b: str, k: int = 9) -> float:
    """Ground truth: set Jaccard over k-byte shingles, computed with nothing
    but ``encode`` + slicing + set algebra."""
    ba, bb = a.encode("utf-8"), b.encode("utf-8")
    sa = {ba[i:i + k] for i in range(len(ba) - k + 1)}
    sb = {bb[i:i + k] for i in range(len(bb) - k + 1)}
    if not sa and not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def test_minhash_estimates_match_bruteforce_jaccard():
    """50 docs spanning the whole similarity range (identical → disjoint):
    per-pair |estimate − exact| must stay inside ~4σ of the MinHash binomial
    error (σ = √(J(1−J)/128) ≤ 0.045), and the mean absolute error must be
    near the theoretical ~σ·√(2/π). Deterministic: fixed texts, fixed hash
    seed."""
    import random

    rng = random.Random(1234)
    vocab = [f"word{i}" for i in range(400)]
    base = [rng.choice(vocab) for _ in range(60)]
    docs = []
    for i in range(50):
        words = list(base)
        # progressively mutate: doc 0 is the base, doc 49 nearly disjoint
        n_mut = int(len(words) * i / 40)
        for j in rng.sample(range(len(words)), min(n_mut, len(words))):
            words[j] = rng.choice(vocab)
        docs.append(" ".join(words))

    sigs = minhash_signature_batch(docs, n_hashes=128, shingle=9, seed=42)
    errs = []
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            sa, sb = np.asarray(sigs[a]), np.asarray(sigs[b])
            est = float((sa == sb).mean())
            exact = _exact_jaccard(docs[a], docs[b], k=9)
            err = abs(est - exact)
            assert err <= 0.2, (a, b, est, exact)
            errs.append(err)
    assert float(np.mean(errs)) <= 0.04, float(np.mean(errs))


# Held-out sentences written for this test — none appear in
# functions/corpus.py (the training corpus).
_HELD_OUT = {
    "en": [
        "The quiet library smelled of old paper while rain tapped the windows.",
        "She carried the groceries up three flights of stairs without stopping.",
        "A narrow road wound between the hills toward the fishing village.",
        "He fixed the broken fence before the cattle noticed the gap.",
        "The committee postponed its decision until the figures were checked.",
        "Children chased the kite across the field until the string snapped.",
        "Fresh snow covered the rooftops of the small town by morning.",
        "The engineer explained why the bridge needed another support beam.",
    ],
    "de": [
        "Der alte Lehrer erklärte den Schülern die Geschichte der kleinen Stadt.",
        "Am Abend tranken wir Kaffee und sahen den Schiffen im Hafen zu.",
        "Die Kinder spielten trotz des Regens den ganzen Nachmittag im Garten.",
        "Sie kaufte frisches Brot und Käse auf dem Markt am Samstagmorgen.",
        "Der Zug nach München hatte wegen des Sturms zwei Stunden Verspätung.",
        "Im Winter wandern nur wenige Leute über den steilen Bergpfad.",
        "Das Konzert begann später, weil der Dirigent im Stau stand.",
        "Unsere Nachbarn haben ein neues Dach auf ihr altes Haus gebaut.",
    ],
    "fr": [
        "Le vieux pêcheur réparait ses filets assis devant la mer calme.",
        "Elle a oublié son parapluie dans le train pour Marseille.",
        "Les enfants ont ramassé des châtaignes dans la forêt derrière l'école.",
        "Nous avons visité un petit musée consacré à l'histoire du village.",
        "Le boulanger ouvre sa boutique avant le lever du soleil chaque jour.",
        "Il faudra beaucoup de patience pour apprendre ce morceau de piano.",
        "La bibliothèque municipale ferme ses portes à dix-huit heures précises.",
        "Après la pluie, les rues du quartier sentaient la terre mouillée.",
    ],
    "es": [
        "La abuela preparaba sopa de verduras mientras los niños ponían la mesa.",
        "El tren salió de la estación con veinte minutos de retraso esta mañana.",
        "Caminamos por la playa recogiendo conchas hasta que se puso el sol.",
        "Mi hermano estudia historia en la universidad de una ciudad pequeña.",
        "Los agricultores esperan que llueva antes de sembrar el maíz.",
        "Ella escribió una carta larga a su amiga que vive en el extranjero.",
        "El mercado del barrio vende fruta fresca todos los sábados.",
        "Durante el verano las calles del pueblo se llenan de turistas.",
    ],
}


def test_langid_accuracy_on_held_out_sentences():
    """classify_text must reach ≥85% accuracy on labeled sentences it never
    trained on — an algorithm-level check with independent ground truth
    (human labels), unlike the shared-function literal oracles."""
    total = correct = 0
    per_lang = {}
    for lang, sentences in _HELD_OUT.items():
        hits = sum(1 for s in sentences if classify_text(s)[0] == lang)
        per_lang[lang] = hits / len(sentences)
        correct += hits
        total += len(sentences)
    assert correct / total >= 0.85, per_lang
    # no language may collapse entirely (majority correct per language)
    assert all(v > 0.5 for v in per_lang.values()), per_lang


def test_ngram_jaccard_pairs_match_pure_python_set_jaccard(spark):
    """``ngram_jaccard_pairs`` (uncapped = textbook Jaccard) must agree
    EXACTLY with a pure-Python ground truth built from nothing but
    ``str.split``-style tokenization + tuple sets — no xxhash, no Spark, no
    shared helpers. Catches a bug inside the shingle construction (slice
    bounds, separator collisions, array_distinct semantics) that the
    literal-oracle replay cannot see."""
    import random
    import re

    from dataqualityassistant_spark.ops.dedup import ngram_jaccard_pairs

    rng = random.Random(77)
    vocab = [f"tok{i}" for i in range(120)]
    base = [rng.choice(vocab) for _ in range(40)]
    docs = []
    for i in range(30):
        words = list(base)
        for j in rng.sample(range(len(words)), int(len(words) * i / 29)):
            words[j] = rng.choice(vocab)
        # vary whitespace: the tokenizer must treat runs of [ \t\n\f\r]+ as
        # one separator and ignore leading/trailing whitespace
        sep = [" ", "  ", "\t", "\n", " \r "][i % 5]
        docs.append((i, sep.join(words) + ("\n" if i % 3 == 0 else "")))
    docs.append((30, "too short"))          # < n words: no shingles, no pairs
    docs.append((31, "tok0 tok1 tok2"))     # exactly n words: one shingle

    n = 3
    def grams(text):
        words = [w for w in re.split(r"[ \t\n\f\r]+", text) if w]
        return {tuple(words[i:i + n]) for i in range(len(words) - n + 1)}

    want = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            ga, gb = grams(docs[a][1]), grams(docs[b][1])
            if not ga or not gb:
                continue
            j = len(ga & gb) / len(ga | gb)
            if j >= 0.2:
                want[(docs[a][0], docs[b][0])] = j

    df = spark.createDataFrame(docs, "doc_id: long, text: string").repartition(4)
    pairs = ngram_jaccard_pairs(df, n=n, threshold=0.2, max_shingle_df=None,
                                materialize=True).toPandas()
    got = {tuple(sorted((int(a), int(b)))): float(j)
           for a, b, j in zip(pairs["id_a"], pairs["id_b"], pairs["jaccard"])}
    assert set(got) == set(want), (set(got) ^ set(want))
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, (k, got[k], want[k])
