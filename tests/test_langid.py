"""Char-trigram language ID (round-5 VERDICT item #5: the marker-word
stub upgraded to a trained classifier).

The model is a centered multinomial over character trigrams trained at
import from the embedded public-domain seed corpus (UDHR Article 1 +
everyday phrases, 6 languages), with integer micro-logit weights so the
Spark and DuckDB renderings sum exactly.  Tests pin held-out accuracy
(sentences NOT in the seeds), the deterministic und/tie rules, and
bitwise Python == DuckDB == Spark agreement."""

import duckdb
import pytest

from lucene_spark.ops import dialect as dl
from lucene_spark.ops import langid as L

HELD_OUT = {
    "en": [
        "The museum will be closed next Monday because of the national holiday.",
        "Many students prefer to study in the library during the winter months.",
        "A good breakfast should include fruit, bread and something warm to drink.",
        "They travelled through the mountains for five days before reaching the coast.",
        "Please remember to turn off the lights when you leave the office.",
        "Our neighbours bought a small boat and sail on the lake every weekend.",
    ],
    "de": [
        "Das Museum bleibt am kommenden Montag wegen des Feiertags geschlossen.",
        "Viele Studenten lernen im Winter lieber in der Bibliothek.",
        "Ein gutes Frühstück sollte Obst, Brot und etwas Warmes zu trinken enthalten.",
        "Sie reisten fünf Tage durch die Berge, bevor sie die Küste erreichten.",
        "Bitte denken Sie daran, das Licht auszuschalten, wenn Sie das Büro verlassen.",
        "Unsere Nachbarn haben ein kleines Boot gekauft und segeln jedes Wochenende auf dem See.",
    ],
    "fr": [
        "Le musée sera fermé lundi prochain en raison du jour férié national.",
        "Beaucoup d'étudiants préfèrent étudier à la bibliothèque pendant l'hiver.",
        "Un bon petit déjeuner devrait comprendre des fruits, du pain et une boisson chaude.",
        "Ils ont voyagé à travers les montagnes pendant cinq jours avant d'atteindre la côte.",
        "N'oubliez pas d'éteindre la lumière quand vous quittez le bureau.",
        "Nos voisins ont acheté un petit bateau et naviguent sur le lac chaque week-end.",
    ],
    "es": [
        "El museo estará cerrado el próximo lunes debido al día festivo nacional.",
        "Muchos estudiantes prefieren estudiar en la biblioteca durante el invierno.",
        "Un buen desayuno debería incluir fruta, pan y algo caliente para beber.",
        "Viajaron por las montañas durante cinco días antes de llegar a la costa.",
        "Por favor, recuerda apagar las luces cuando salgas de la oficina.",
        "Nuestros vecinos compraron un barco pequeño y navegan en el lago cada fin de semana.",
    ],
    "it": [
        "Il museo sarà chiuso lunedì prossimo a causa della festa nazionale.",
        "Molti studenti preferiscono studiare in biblioteca durante l'inverno.",
        "Una buona colazione dovrebbe includere frutta, pane e qualcosa di caldo da bere.",
        "Hanno viaggiato attraverso le montagne per cinque giorni prima di raggiungere la costa.",
        "Per favore, ricordati di spegnere le luci quando esci dall'ufficio.",
        "I nostri vicini hanno comprato una piccola barca e navigano sul lago ogni fine settimana.",
    ],
    "pt": [
        "O museu estará fechado na próxima segunda-feira por causa do feriado nacional.",
        "Muitos estudantes preferem estudar na biblioteca durante o inverno.",
        "Um bom café da manhã deveria incluir fruta, pão e algo quente para beber.",
        "Eles viajaram pelas montanhas durante cinco dias antes de chegar à costa.",
        "Por favor, lembre-se de apagar as luzes quando sair do escritório.",
        "Os nossos vizinhos compraram um barco pequeno e navegam no lago todos os fins de semana.",
    ],
}

# no-evidence inputs -> 'und'; "a" is excluded (the ' a ' trigram IS
# genuine evidence — the article dominates English seeds)
EDGE = ["", "12345 !!! ???", "zzqx wvk jjy", "   "]
PARITY_EXTRA = ["a", "der der der", "que que"]


def _rows():
    rows = []
    i = 0
    for sents in HELD_OUT.values():
        for s in sents:
            rows.append((i, s))
            i += 1
    for s in EDGE + PARITY_EXTRA:
        rows.append((i, s))
        i += 1
    return rows


def test_held_out_accuracy():
    """>= 94% on held-out sentences (currently 36/36 — the bar leaves
    one miss of headroom against future seed tweaks)."""
    ok = n = 0
    for lang, sents in HELD_OUT.items():
        for s in sents:
            n += 1
            ok += L.classify(s) == lang
    assert ok / n >= 0.94, (ok, n)


def test_und_and_determinism():
    for s in EDGE:
        assert L.classify(s) == "und", s
    # stable across calls (trained once at import)
    assert L.classify("the cat sat on the mat") == L.classify(
        "the cat sat on the mat"
    )
    assert len(L.WEIGHTS) > 0
    assert all(w > 0 for _, _, w in L.WEIGHTS)


def test_duckdb_matches_python():
    rows = _rows()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, ?)" for i, _ in rows)
        + ") t(doc_id, text)",
        [s for _, s in rows],
    )
    got = con.execute(L.lang_id_ngram_sql(dl.DUCK)).fetchall()
    assert got == [(i, L.classify(s)) for i, s in rows]


def test_spark_matches_python(spark):
    rows = _rows()
    spark.createDataFrame(rows, ["doc_id", "text"]).createOrReplaceTempView(
        "documents"
    )
    got = [
        (r.doc_id, r.pred_lang)
        for r in spark.sql(L.lang_id_ngram_sql(dl.SPARK)).collect()
    ]
    assert got == [(i, L.classify(s)) for i, s in rows]
