"""Light/minimal language stemmers + cjk_bigram filter.

Goldens are hand-written from the published rule sets (Savoy SAC 2006 /
the Lucene light-stemmer family's documented behavior), NOT computed by
the implementation under test.
"""

from sparksearch.stemmers import (light_german_stem, light_spanish_stem,
                                  minimal_english_stem, minimal_french_stem)


def test_minimal_english_goldens():
    for w, s in [
        ("queries", "querie"),   # plural 's' only — no 'ies' rule
        ("tables", "table"),
        ("joins", "join"),
        ("glass", "glass"),      # -ss protected
        ("virus", "virus"),      # -us protected
        ("as", "as"),            # < 3 chars untouched
        ("is", "is"),
        ("run", "run"),
    ]:
        assert minimal_english_stem(w) == s, w


def test_minimal_french_goldens():
    for w, s in [
        ("chevaux", "cheval"),    # the Savoy 'aux' -> 'al' headline case
        ("heureux", "heureu"),    # plain final-x drop
        ("tables", "tabl"),       # s, then e
        ("customers", "custom"),  # s, then r, then e
        ("pommes", "pomm"),       # s, e, then double-letter reduce... no:
                                  # pommes -> pomme -> pomm (double kept:
                                  # m==m reduces) -> pom
        ("table", "table"),       # < 6 chars untouched
        ("query", "query"),
    ]:
        if w == "pommes":
            continue  # asserted precisely below
        assert minimal_french_stem(w) == s, w
    # order of operations: s -> (no r) -> e -> (no é) -> double reduce
    assert minimal_french_stem("pommes") == "pom"


def test_light_german_goldens():
    for w, s in [
        ("häuser", "haus"),       # fold ä, strip -er
        ("kindern", "kind"),      # -ern
        ("frauen", "frau"),       # -en
        ("tages", "tag"),         # -es
        ("jahre", "jahr"),        # -e
        ("rechts", "recht"),      # -s after stem-final 't'
        ("haus", "haus"),         # 's' after 'u': not an st-ending
        ("schönste", "schonst"),  # pass1 strips -e; -est needs pass2 order
    ]:
        assert light_german_stem(w) == s, w


def test_light_spanish_goldens():
    for w, s in [
        ("casas", "cas"),         # -as
        ("casa", "casa"),         # 4 chars: under the len-5 guard
        ("luces", "luz"),         # -ces -> -z
        ("meses", "mes"),         # -eses -> -es
        ("libros", "libr"),       # -os
        ("columnas", "column"),
        ("señores", "señor"),     # -es
        ("azul", "azul"),         # no rule fires
        ("cantó", "cant"),        # accent fold then final vowel
        ("mesas", "mes"),
        ("data", "data"),         # < 5 chars untouched
    ]:
        assert light_spanish_stem(w) == s, w


def test_stemmer_filter_routing():
    from sparksearch.analysis_custom import _tf_stemmer
    toks = [("häuser", 0), ("tables", 1)]
    de = _tf_stemmer({"language": "light_german"})(toks)
    assert de == [("haus", 0), ("tabl", 1)]
    import pytest
    with pytest.raises(ValueError):
        _tf_stemmer({"language": "klingon"})


def test_cjk_bigram_filter():
    from sparksearch.analysis_custom import _tf_cjk_bigram
    f = _tf_cjk_bigram({})
    # per-char Han tokens from the standard tokenizer
    assert f([("日", 0), ("本", 1), ("語", 2)]) == \
        [("日本", 0), ("本語", 1)]
    # whole-run katakana token: bigrams over its chars
    assert f([("テスト", 0)]) == [("テス", 0), ("スト", 1)]
    # mixed: latin passes through, runs split at non-CJK
    assert f([("日", 0), ("本", 1), ("spark", 2), ("中", 3)]) == \
        [("日本", 0), ("spark", 1), ("中", 2)]
    # non-adjacent CJK tokens (position gap) do not form a bigram
    assert f([("日", 0), ("本", 5)]) == [("日", 0), ("本", 1)]
    # output_unigrams=true emits both
    g = _tf_cjk_bigram({"output_unigrams": True})
    assert g([("日", 0), ("本", 1)]) == \
        [("日", 0), ("本", 1), ("日本", 2)]


def test_cjk_bigram_custom_analyzer_end_to_end():
    from sparksearch.analysis import analyze
    from sparksearch.analysis_custom import register_analyzer
    register_analyzer("cjk_test", {
        "tokenizer": "standard",
        "filter": [{"type": "cjk_bigram"}, "lowercase"],
    })
    toks = analyze("日本語 SPARK テスト", "cjk_test")
    assert [(t, p) for t, p in toks] == [
        ("日本", 0), ("本語", 1), ("spark", 2), ("テス", 3), ("スト", 4)]


def test_possessive_english_goldens():
    from sparksearch.stemmers import possessive_english_stem
    for w, s in [("john's", "john"), ("spark’s", "spark"),
                 ("its", "its"), ("class'", "class'"), ("'s", "")]:
        assert possessive_english_stem(w) == s, w


def test_minimal_portuguese_goldens():
    """Orengo & Huyck plural-reduction step (SPIRE 2001)."""
    from sparksearch.stemmers import minimal_portuguese_stem as st
    for w, s in [("balões", "balão"), ("normais", "normal"),
                 ("papéis", "papel"), ("barris", "barril"),
                 ("bons", "bom"), ("casas", "casa"),
                 ("ônibus", "ônibus"), ("atrás", "atrá"),
                 ("mar", "mar"), ("dois", "doil")]:
        assert st(w) == s, w


def test_light_portuguese_goldens():
    from sparksearch.stemmers import light_portuguese_stem as st
    for w, s in [("gatos", "gat"), ("gata", "gat"), ("gato", "gat"),
                 ("ações", "aco"), ("colunas", "colun"),
                 ("tablo", "tabl")]:
        assert st(w) == s, w


def test_light_italian_goldens():
    from sparksearch.stemmers import light_italian_stem as st
    for w, s in [("ragazzo", "ragazz"), ("ragazzi", "ragazz"),
                 ("ragazza", "ragazz"), ("negozio", "negoz"),
                 ("negozi", "negoz"), ("storie", "stor"),
                 ("storia", "stor"), ("perché", "perch"),
                 ("città", "citta"), ("amico", "amico")]:
        assert st(w) == s, w


def test_light_russian_goldens():
    from sparksearch.stemmers import light_russian_stem as st
    for w, s in [("красивый", "красив"), ("красивая", "красив"),
                 ("новые", "нов"), ("книгами", "книг"),
                 ("книги", "книг"), ("книга", "книг"),
                 ("дом", "дом"), ("table", "table")]:
        assert st(w) == s, w


def test_arabic_light10_goldens():
    from sparksearch.stemmers import arabic_light_stem as st
    for w, s in [("الكتاب", "كتاب"), ("والمكتبة", "مكتب"),
                 ("للطلاب", "طلاب"), ("مدرسون", "مدرس"),
                 ("يعملون", "يعمل"), ("هنا", "هنا")]:
        assert st(w) == s, w


def test_new_stemmers_registered_in_filter_factory():
    from sparksearch.analysis_custom import _tf_stemmer
    for lang, w, s in [("light_portuguese", "gatos", "gat"),
                       ("light_italian", "ragazzi", "ragazz"),
                       ("light_russian", "книгами", "книг"),
                       ("arabic", "الكتاب", "كتاب"),
                       ("minimal_portuguese", "balões", "balão")]:
        f = _tf_stemmer({"language": lang})
        assert f([(w, 0)]) == [(s, 0)], lang


def test_light_swedish_goldens():
    from sparksearch.stemmers import light_swedish_stem as st
    for w, s in [("bilarna", "bil"), ("flickorna", "flick"),
                 ("starkaste", "stark"), ("flickors", "flick"),
                 ("handelser", "hand"), ("merger", "merg"),
                 ("sorat", "sor"), ("hus", "hus"), ("table", "tabl")]:
        assert st(w) == s, w


def test_norwegian_goldens():
    from sparksearch.stemmers import (light_norwegian_stem as lt,
                                      minimal_norwegian_stem as mn)
    for w, s in [("tabler", "tabl"), ("scanene", "scan"),
                 ("huset", "hus"), ("jenta", "jent"), ("scan", "scan")]:
        assert mn(w) == s and lt(w) == s, w
    assert lt("kjærligheten") == "kjærlig"
    assert lt("bevegelse") == "beveg"
    # minimal lacks the nominalizer rules
    assert mn("bevegelse") == "bevegels"


def test_hindi_goldens():
    from sparksearch.stemmers import hindi_stem as st
    for w, s in [("लड़के", "लड़क"), ("लड़का", "लड़क"), ("लड़की", "लड़क"),
                 ("करने", "कर"), ("करता", "कर"), ("करती", "कर"),
                 ("भेजेगा", "भेज"), ("किताबों", "किताब"),
                 ("table", "table"), ("कर", "कर")]:
        assert st(w) == s, w


def test_scandinavian_hindi_registered_in_filter_factory():
    from sparksearch.analysis_custom import _tf_stemmer
    for lang, w, s in [("light_swedish", "bilarna", "bil"),
                       ("light_norwegian", "scanene", "scan"),
                       ("minimal_norwegian", "tabler", "tabl"),
                       ("hindi", "किताबों", "किताब")]:
        f = _tf_stemmer({"language": lang})
        assert f([(w, 0)]) == [(s, 0)], lang


def test_czech_light_goldens():
    from sparksearch.stemmers import czech_stem as st
    # Dolamic-Savoy case endings: hrady/hradu/hradem -> hrad;
    # ženami/ženách -> žen; possessive otcov -> otc
    for w, s in [("hrady", "hrad"), ("hradem", "hrad"), ("hradu", "hrad"),
                 ("ženami", "žen"), ("ženách", "žen"),
                 ("nejnovějších", "nejnovějš"), ("otcov", "otc"),
                 ("dům", "dům")]:
        assert st(w) == s, (w, st(w))


def test_norm_filters_round3e():
    from sparksearch.analysis_custom import _TOKEN_FILTERS
    sr = _TOKEN_FILTERS["serbian_normalization"]({})
    assert sr([("ђачки", 0), ("џез", 1)]) == [("djacki", 0), ("dzez", 1)]
    hi = _TOKEN_FILTERS["hindi_normalization"]({})
    assert hi([("क़रीब", 0), ("हाँ", 1)]) == [("करीब", 0), ("हां", 1)]
    ckb = _TOKEN_FILTERS["sorani_normalization"]({})
    assert ckb([("يك", 0)]) == [("یک", 0)]
    cat = _TOKEN_FILTERS["concatenate_graph"]({})
    assert cat([("new", 0), ("york", 1)]) == [("new york", 0)]
    cat2 = _TOKEN_FILTERS["concatenate_graph"]({"token_separator": "_"})
    assert cat2([("a", 0), ("b", 1)]) == [("a_b", 0)]
    ar = _TOKEN_FILTERS["arabic_stem"]({})
    assert ar([("الكتاب", 0)]) == [("كتاب", 0)]
    cz = _TOKEN_FILTERS["czech_stem"]({})
    assert cz([("hrady", 0)]) == [("hrad", 0)]


def test_snowball_german():
    from sparksearch.snowball import german_snowball_stem as st
    for w, s in [("häuser", "haus"), ("kinder", "kind"),
                 ("kategorie", "kategori"), ("schönheit", "schonheit"),
                 ("aufeinander", "aufeinand"), ("bücher", "buch"),
                 ("arbeiten", "arbeit"), ("schnelles", "schnell"),
                 ("verständnisse", "verstandnis"), ("mädchen", "madch")]:
        assert st(w) == s, (w, st(w))


def test_snowball_russian():
    from sparksearch.snowball import russian_snowball_stem as st
    # важность: noun -ь strips, derivational -ост is OUTSIDE R2 (spec)
    for w, s in [("книгами", "книг"), ("книги", "книг"),
                 ("красивый", "красив"), ("читала", "чита"),
                 ("делавшись", "дела"), ("новейший", "нов"),
                 ("писал", "писа"), ("стол", "стол"),
                 ("осталось", "оста"), ("важность", "важност")]:
        assert st(w) == s, (w, st(w))


def test_snowball_registered():
    from sparksearch.analysis_custom import _tf_stemmer
    f = _tf_stemmer({"language": "german"})
    assert f([("häuser", 0)]) == [("haus", 0)]
    f = _tf_stemmer({"language": "russian"})
    assert f([("книгами", 0)]) == [("книг", 0)]


def test_snowball_french():
    from sparksearch.snowball import french_snowball_stem as st
    # every vector hand-traced from the published spec (important: step
    # 2b deletes -ant in RV; belle: step-5 undoubles -ell; possibilité
    # keeps -ibil because the precedence suffix is literally "abil")
    for w, s in [("majestueux", "majestu"), ("continuer", "continu"),
                 ("continuité", "continu"), ("mangeaient", "mang"),
                 ("châteaux", "château"), ("finissait", "fin"),
                 ("nationale", "national"), ("nationaux", "national"),
                 ("logiquement", "logiqu"), ("sincèrement", "sincer"),
                 ("important", "import"), ("chanter", "chant"),
                 ("chantée", "chant"), ("belle", "bel"),
                 ("actuellement", "actuel"),
                 ("possibilité", "possibil")]:
        assert st(w) == s, (w, st(w))
    from sparksearch.analysis_custom import _tf_stemmer
    f = _tf_stemmer({"language": "french"})
    assert f([("chanter", 0)]) == [("chant", 0)]


def test_snowball_spanish():
    from sparksearch.snowball import spanish_snowball_stem as st
    # hand-traced from the published spec (generosidad: step-3 residual
    # -os strips after -idad; dándoselo: pronoun pattern outside RV)
    for w, s in [("cantando", "cant"), ("canciones", "cancion"),
                 ("nacionalidad", "nacional"), ("lógicamente", "logic"),
                 ("comieron", "com"), ("rápidamente", "rapid"),
                 ("trabajadores", "trabaj"), ("generosidad", "gener"),
                 ("libros", "libr"), ("corriendo", "corr"),
                 ("comérselo", "com"), ("cantándola", "cant"),
                 ("dándoselo", "dandosel")]:
        assert st(w) == s, (w, st(w))
    from sparksearch.analysis_custom import _tf_stemmer
    f = _tf_stemmer({"language": "spanish"})
    assert f([("cantando", 0)]) == [("cant", 0)]


def test_snowball_dutch():
    from sparksearch.snowball import dutch_snowball_stem as st
    # hand-traced from the spec (mogelijkheden: heden->heid, heid strips
    # in R2, but "lijk" then starts before R2 so it stays)
    for w, s in [("lichamelijk", "licham"), ("lichamen", "licham"),
                 ("boeken", "boek"), ("huizen", "huiz"),
                 ("katten", "kat"), ("banen", "ban"),
                 ("aanbiedingen", "aanbied"),
                 ("mogelijkheden", "mogelijk")]:
        assert st(w) == s, (w, st(w))
    from sparksearch.analysis_custom import _tf_stemmer
    f = _tf_stemmer({"language": "dutch"})
    assert f([("boeken", 0)]) == [("boek", 0)]


def test_prebuilt_language_analyzers():
    from sparksearch.analysis_custom import get_custom
    from sparksearch.lang_analyzers import LANG_ANALYZERS
    assert len(LANG_ANALYZERS) == 19
    terms = lambda n, t: [(x.term, x.pos) for x in get_custom(n).analyze(t)]
    assert terms("french", "L'église et les chanteurs") == [
        ("églis", 0), ("chanteur", 3)]
    assert terms("german", "Die Häuser und Kinder") == [
        ("haus", 1), ("kind", 3)]
    assert terms("dutch", "de kinderen en boeken") == [
        ("kinder", 1), ("boek", 3)]
    assert terms("hindi", "लड़के और किताबों") == [
        ("लडक", 0), ("किताब", 2)]
    assert terms("arabic", "الكتاب من المدرسة") == [
        ("كتاب", 0), ("مدرس", 2)]
    # every prebuilt name resolves and analyzes without error
    for name in LANG_ANALYZERS:
        assert get_custom(name).analyze("test 42") is not None


def test_porter2():
    import pytest

    from sparksearch.snowball import porter2_stem as p2
    for w, s in [("crying", "cri"), ("dying", "die"), ("skies", "sky"),
                 ("generously", "generous"), ("generate", "generat"),
                 ("running", "run"), ("hopping", "hop"),
                 ("hoping", "hope"), ("happiness", "happi"),
                 ("relational", "relat"), ("rational", "ration"),
                 ("agreed", "agre"), ("feed", "feed"),
                 ("exceed", "exceed"), ("early", "earli"),
                 ("knitting", "knit"), ("news", "news")]:
        assert p2(w) == s, (w, p2(w))
    from sparksearch.analysis_custom import _tf_stemmer
    f = _tf_stemmer({"language": "porter2"})
    assert f([("crying", 0)]) == [("cri", 0)]
    # Porter1 stays on the "english" name (Lucene routing)
    f1 = _tf_stemmer({"language": "english"})
    assert f1([("crying", 0)]) == [("cry", 0)]
    # genuinely different algorithms refuse loudly
    with pytest.raises(NotImplementedError):
        _tf_stemmer({"language": "kstem"})
    with pytest.raises(NotImplementedError):
        _tf_stemmer({"language": "lovins"})


def test_snowball_swedish_danish():
    from sparksearch.snowball import (danish_snowball_stem as da,
                                      swedish_snowball_stem as sv)
    # spec-traced: jakt keeps kt (pair outside R1), möjligheterna loses
    # heterna then lig; dejligt: gt shortens then lig strips
    for w, s in [("bilarna", "bil"), ("flickorna", "flick"),
                 ("starkaste", "stark"), ("möjligheterna", "möj"),
                 ("vänligt", "vän"), ("jakt", "jakt"),
                 ("klokast", "klok")]:
        assert sv(w) == s, (w, sv(w))
    for w, s in [("bilerne", "bil"), ("huset", "hus"),
                 ("venligst", "ven"), ("følelser", "føl"),
                 ("dejligt", "dej"), ("kvinderne", "kvind")]:
        assert da(w) == s, (w, da(w))
    from sparksearch.analysis_custom import _tf_stemmer
    assert _tf_stemmer({"language": "swedish"})([("bilarna", 0)]) == [
        ("bil", 0)]
    assert _tf_stemmer({"language": "danish"})([("kvinderne", 0)]) == [
        ("kvind", 0)]


def test_snowball_norwegian():
    from sparksearch.snowball import norwegian_snowball_stem as st
    for w, s in [("bilene", "bil"), ("huset", "hus"),
                 ("vakkert", "vakker"), ("mulighetene", "mul"),
                 ("venlige", "ven"), ("bøkene", "bøk"),
                 ("norske", "norsk"), ("viktigste", "viktigst")]:
        assert st(w) == s, (w, st(w))
    from sparksearch.analysis_custom import _tf_stemmer
    assert _tf_stemmer({"language": "norwegian"})([("bilene", 0)]) == [
        ("bil", 0)]


def test_snowball_italian():
    from sparksearch.snowball import italian_snowball_stem as st
    # spec-traced (andare: "are" starts before RV so only the final
    # vowel strips; lunghe: step-3b gh->g)
    for w, s in [("ragazzo", "ragazz"), ("ragazzi", "ragazz"),
                 ("andare", "andar"), ("abbandonata", "abbandon"),
                 ("nazionale", "nazional"), ("logica", "logic"),
                 ("parlando", "parl"), ("mangiandolo", "mang"),
                 ("lunghe", "lung"), ("amiche", "amic")]:
        assert st(w) == s, (w, st(w))
    from sparksearch.analysis_custom import _tf_stemmer
    assert _tf_stemmer({"language": "italian"})([("ragazzi", 0)]) == [
        ("ragazz", 0)]


def test_snowball_portuguese():
    from sparksearch.snowball import portuguese_snowball_stem as st
    # spec-traced (começar: verb -ar then the step-5 cedilla fold)
    for w, s in [("gatos", "gat"), ("cantando", "cant"),
                 ("nacionalidade", "nacional"), ("bandeira", "bandeir"),
                 ("começar", "comec"), ("quilométricas", "quilométr"),
                 ("falou", "fal"), ("comeu", "com"),
                 ("partiu", "part")]:
        assert st(w) == s, (w, st(w))
    from sparksearch.analysis_custom import _tf_stemmer
    assert _tf_stemmer({"language": "portuguese"})([("gatos", 0)]) == [
        ("gat", 0)]
