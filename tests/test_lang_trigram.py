"""Char-trigram language ID: held-out accuracy vs the marker-word
baseline, plus Spark-vs-Python normalization equivalence (the profile
builder normalizes in Python; the scorer normalizes in Spark — these
must agree or profiles and docs live in different spaces)."""

from pyspark.sql import functions as F

from biocypher_metta_spark.operators.text import (
    LANG_TRIGRAMS, _norm_text_py, char_trigrams, lang_id, lang_id_trigram)

# held-out sentences — none shared with LANG_TRIGRAM_SNIPPETS
HELD_OUT = [
    ("en", "she walked slowly into the old library and found a small book "
           "about the history of the town that nobody had opened for years"),
    ("en", "we will meet tomorrow morning near the station because the "
           "train leaves early and there is much work to finish this week"),
    ("de", "er ging langsam in die alte bibliothek und fand ein kleines "
           "buch ueber die geschichte der stadt das niemand geoeffnet hatte"),
    ("de", "wir treffen uns morgen frueh am bahnhof weil der zug frueh "
           "faehrt und noch viel arbeit vor dem ende der woche wartet"),
    ("fr", "elle marchait lentement dans la vieille bibliotheque et trouva "
           "un petit livre sur l'histoire de la ville que personne ne lisait"),
    ("fr", "nous nous retrouverons demain matin pres de la gare parce que "
           "le train part tot et il reste beaucoup de travail a finir"),
    ("es", "ella camino despacio hacia la vieja biblioteca y encontro un "
           "pequeno libro sobre la historia de la ciudad que nadie leia"),
    ("es", "nos encontraremos manana por la manana cerca de la estacion "
           "porque el tren sale temprano y queda mucho trabajo pendiente"),
    ("pt", "ela caminhou devagar pela velha biblioteca e encontrou um "
           "pequeno livro sobre a historia da cidade que ninguem abriu"),
    ("pt", "vamos nos encontrar amanha de manha perto da estacao porque o "
           "trem sai cedo e ainda ha muito trabalho para terminar"),
    ("it", "lei cammino lentamente nella vecchia biblioteca e trovo un "
           "piccolo libro sulla storia della citta che nessuno aveva aperto"),
    ("it", "ci incontreremo domani mattina vicino alla stazione perche il "
           "treno parte presto e resta molto lavoro da finire"),
    ("nl", "zij liep langzaam de oude bibliotheek binnen en vond een klein "
           "boek over de geschiedenis van de stad dat niemand had geopend"),
    ("nl", "we zien elkaar morgenochtend bij het station omdat de trein "
           "vroeg vertrekt en er nog veel werk af moet deze week"),
    ("sv", "hon gick langsamt in i det gamla biblioteket och hittade en "
           "liten bok om stadens historia som ingen hade oeppnat"),
    ("sv", "vi ses i morgon bitti vid stationen eftersom taget gar tidigt "
           "och det finns mycket arbete som maste bli klart fore slutet"),
    ("da", "hun gik langsomt ind i det gamle bibliotek og fandt en lille "
           "bog om byens historie som ingen havde aabnet i mange aar"),
    ("da", "vi moedes i morgen tidlig ved stationen fordi toget koerer "
           "tidligt og der er meget arbejde der skal goeres i denne uge"),
    ("pl", "ona szla powoli do starej biblioteki i znalazla mala ksiazke "
           "o historii miasta ktorej nikt nie otwieral od wielu lat"),
    ("pl", "spotkamy sie jutro rano kolo dworca poniewaz pociag odjezdza "
           "wczesnie a w tym tygodniu zostalo jeszcze duzo pracy"),
    ("ro", "ea mergea incet in vechea biblioteca si a gasit o carte mica "
           "despre istoria orasului pe care nimeni nu o deschisese de ani"),
    ("ro", "ne vom intalni maine dimineata langa gara pentru ca trenul "
           "pleaca devreme si mai este mult de lucru saptamana aceasta"),
    ("fi", "han kaveli hitaasti vanhaan kirjastoon ja loysi pienen kirjan "
           "kaupungin historiasta jota kukaan ei ollut avannut vuosiin"),
    ("fi", "tapaamme huomenna aamulla aseman lahella koska juna lahtee "
           "aikaisin ja talla viikolla on viela paljon tyota tehtavana"),
    ("tr", "yavasca eski kutuphaneye girdi ve yillardir kimsenin acmadigi "
           "sehrin tarihi hakkinda kucuk bir kitap buldu"),
    ("tr", "yarin sabah istasyonun yaninda bulusacagiz cunku tren erken "
           "kalkiyor ve bu hafta bitirilecek cok is var"),
    ("id", "dia berjalan perlahan ke perpustakaan tua dan menemukan "
           "sebuah buku kecil tentang sejarah kota yang tidak pernah "
           "dibuka selama bertahun tahun"),
    ("id", "kita akan bertemu besok pagi di dekat stasiun karena kereta "
           "berangkat pagi sekali dan masih banyak pekerjaan minggu ini"),
]


def test_profiles_shape():
    assert set(LANG_TRIGRAMS) == {"en", "de", "fr", "es", "pt", "it", "nl",
                                  "sv", "da", "pl", "ro", "fi", "tr", "id"}
    for lang, prof in LANG_TRIGRAMS.items():
        assert 48 <= len(prof) <= 96, lang
        assert len(set(prof)) == len(prof)
        assert all(len(t) == 3 for t in prof)


def test_spark_trigrams_match_python_normalization(spark):
    texts = [
        "The QUICK, brown fox!  123 jumps...",
        "  leading and trailing   ",
        "",
        "¡Hola! ¿Qué tal?",
        "a",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = df.select(char_trigrams(F.col("text")).alias("tris")).collect()
    for t, row in zip(texts, got):
        s = _norm_text_py(t)
        want = [s[i:i + 3] for i in range(len(s) - 2)]
        assert row.tris == want, t


def _accuracy(preds):
    return sum(1 for want, got in preds if want == got) / len(preds)


def test_heldout_accuracy_beats_marker_baseline(spark):
    df = spark.createDataFrame(
        [(i, lang, text) for i, (lang, text) in enumerate(HELD_OUT)],
        "doc_id long, lang_true string, text string")
    rows = {r.doc_id: r for r in lang_id_trigram(df).collect()}
    mark = {r.doc_id: r.lang_pred for r in lang_id(df).collect()}
    tri_pairs = [(lang, rows[i].lang_pred)
                 for i, (lang, _) in enumerate(HELD_OUT)]
    mark_pairs = [(lang, mark[i]) for i, (lang, _) in enumerate(HELD_OUT)]
    tri_acc, mark_acc = _accuracy(tri_pairs), _accuracy(mark_pairs)
    assert tri_acc >= mark_acc, (tri_acc, mark_acc)
    assert tri_acc >= 0.9, tri_pairs
    # margin contract: non-negative everywhere; strictly positive on
    # every correctly-identified doc (a tie would have picked by dict
    # order, which is not a confident prediction)
    for i, (lang, _) in enumerate(HELD_OUT):
        assert rows[i].margin >= 0
        if rows[i].lang_pred == lang:
            assert rows[i].margin > 0, (lang, rows[i])


def test_empty_and_nonletter_text_is_unk(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "12345 !!! ???")],
        "doc_id long, text string")
    out = {r.doc_id: (r.lang_pred, r.best_score)
           for r in lang_id_trigram(df).collect()}
    assert all(v == ("unk", 0) for v in out.values()), out
