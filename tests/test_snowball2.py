"""Goldens for the continuation Snowball stemmers (snowball2.py).

Each table is hand-derived by walking the published algorithm, the same
honesty contract as tests/test_stemmers.py — they lock the implemented
spec reading, and every pair also asserts the IR property that matters:
inflected forms of one lemma conflate to one stem.
"""

from sparksearch.snowball2 import (finnish_snowball_stem,
                                   german2_snowball_stem,
                                   hungarian_snowball_stem,
                                   romanian_snowball_stem,
                                   turkish_snowball_stem)


def _check(fn, table):
    for word, stem in table:
        assert fn(word) == stem, f"{word!r} -> {fn(word)!r} != {stem!r}"


def test_romanian_goldens():
    _check(romanian_snowball_stem, [
        ("abilitate", "abil"),          # step 2: itate in R2
        ("creativitate", "creativ"),
        ("lucrează", "lucr"),           # step 3 verb suffix ează
        ("lucram", "lucr"),
        ("românesc", "român"),          # step 3 esc
        ("româneşti", "român"),
        ("studenţii", "studenţ"),       # step 0 ii -> i, step 4 vowel
        ("studenţilor", "studenţ"),
        ("istoric", "istor"),           # step 2 ic in R2
        ("istorică", "istor"),
        ("naţionale", "naţional"),
        ("importante", "import"),       # step 2 ante
    ])


def test_romanian_comma_below_normalized():
    # modern comma-below spellings conflate with cedilla spellings
    assert (romanian_snowball_stem("studenții")
            == romanian_snowball_stem("studenţii"))


def test_hungarian_goldens():
    _check(hungarian_snowball_stem, [
        ("házak", "ház"),               # plural -ak
        ("házam", "ház"),               # owner -am
        ("házban", "ház"),              # case -ban
        ("házaink", "ház"),             # plural owner -aink
        ("asztallal", "asztal"),        # instrumental -lal with undouble
        ("könyvek", "könyv"),
        ("könyvünk", "könyv"),
        ("emberek", "ember"),
        ("embereknek", "ember"),
        ("fának", "fa"),                # á before case -> a
        ("almákat", "alma"),            # ák -> a, then -at
    ])


def test_hungarian_undouble_digraph():
    from sparksearch.snowball2 import _hu_undouble
    assert _hu_undouble("maccs") == "macs"     # ccs -> cs, digraph kept
    assert _hu_undouble("toll") == "tol"
    assert _hu_undouble("hossz") == "hosz"     # ssz -> sz


def test_finnish_goldens():
    _check(finnish_snowball_stem, [
        ("taloissa", "talo"),           # case -ssa, plural -i
        ("talossa", "talo"),
        ("talot", "talo"),              # plural -t
        ("talon", "talo"),              # genitive -n
        ("taloja", "talo"),             # partitive -ja (step 4 eja? no: a)
        ("kirjassa", "kirj"),           # tidy strips the final a
        ("kirjat", "kirj"),
        ("kirja", "kirj"),              # base form conflates with these
        ("majahan", "maj"),             # hXn with matching X
        ("kaupungeissa", "kaupung"),
        ("tietokoneella", "tietokon"),
        ("nopeasti", "nopeast"),        # sti in R2
    ])


def test_turkish_goldens():
    _check(turkish_snowball_stem, [
        ("evlerinden", "ev"),           # -ler-i-nden chain
        ("evde", "ev"),
        ("evimiz", "ev"),
        ("kitaplar", "kitap"),
        ("kitapları", "kitap"),
        ("kitabı", "kitap"),            # b -> p final devoicing reversal
        ("ağaçtan", "ağaç"),            # tan (d->t assimilated) + harmony
        ("çocuklarımızdan", "çocuk"),
        ("güzeldir", "güzel"),          # nominal verb -dir
        ("gelmişti", "gelmiş"),         # -ti ((y)DU with t alternant)
        ("okuldaymış", "okul"),         # -da + -ymış (buffer y after vowel)
        ("gözlerim", "göz"),
    ])


def test_turkish_vowel_harmony_blocks():
    # 'ler' (front e) after a back-vowel stem must NOT strip
    assert turkish_snowball_stem("dolarler") == "dolarler"
    # and 'lar' after front stem likewise
    assert turkish_snowball_stem("evlar") == "evlar"


def test_german2_goldens():
    from sparksearch.snowball import german_snowball_stem
    _check(german2_snowball_stem, [
        ("haeuser", "haus"),            # ae folded to ä, then as german
        ("häuser", "haus"),
        ("kinder", "kind"),
        ("schoene", "schon"),           # oe -> ö -> o
    ])
    # ue after q is NOT an umlaut spelling
    assert german2_snowball_stem("quelle") == german_snowball_stem("quelle")


def test_registry_routes():
    from sparksearch.stemmers import LANGUAGE_STEMMERS
    for lang, probe, stem in [("romanian", "studenţii", "studenţ"),
                              ("hungarian", "házak", "ház"),
                              ("finnish", "taloissa", "talo"),
                              ("turkish", "kitaplar", "kitap"),
                              ("german2", "haeuser", "haus")]:
        assert LANGUAGE_STEMMERS[lang](probe) == stem


def test_indonesian_goldens():
    from sparksearch.stemmers import indonesian_stem
    _check(indonesian_stem, [
        ("makanan", "makan"), ("membaca", "baca"), ("menyapu", "sapu"),
        ("memilih", "pilih"), ("belajar", "ajar"), ("bukunya", "buku"),
        ("diambil", "ambil"), ("perjalanan", "jalan"),
        ("pembangunan", "bangun"), ("kirimkan", "kirim"),
        ("mengambil", "ambil"), ("terbesar", "besar"),
        ("keadaan", "ada"), ("bekerja", "kerja"),
        # >2-syllable guard: short words stay whole
        ("rumah", "rumah"), ("buku", "buku"),
    ])


def test_indonesian_cooccurrence_restriction():
    from sparksearch.stemmers import indonesian_stem
    # ke-...-i is a forbidden combination: the -i survives
    assert indonesian_stem("ketahui") == "tahui"


def test_galician_minimal_goldens():
    from sparksearch.stemmers import minimal_galician_stem
    _check(minimal_galician_stem, [
        ("cancións", "canción"), ("animais", "animal"),
        ("papeis", "papel"), ("caracois", "caracol"),
        ("libros", "libro"), ("luz", "luz"),
    ])


def test_nynorsk_aliases_route():
    from sparksearch.stemmers import LANGUAGE_STEMMERS
    assert LANGUAGE_STEMMERS["light_nynorsk"]("husane") == "hus"
    assert LANGUAGE_STEMMERS["minimal_nynorsk"]("hestar") == "hest"


def test_prebuilt_analyzers_new_languages():
    from sparksearch.lang_analyzers import maybe_register
    cases = {
        "romanian": ("studenţii lucrează şi", ["studenţ", "lucr"]),
        "hungarian": ("a házak asztallal", ["ház", "asztal"]),
        "finnish": ("taloissa ja kirjat", ["talo", "kirj"]),
        "turkish": ("Istanbul'da kitaplar ve", ["ıstanbul", "kitap"]),
        "indonesian": ("makanan yang membaca", ["makan", "baca"]),
        "galician": ("as cancións e animais", ["canción", "animal"]),
    }
    for name, (probe, want) in cases.items():
        an = maybe_register(name)
        assert [t for t, _ in an.analyze(probe)] == want, name
