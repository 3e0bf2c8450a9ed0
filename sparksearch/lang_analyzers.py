"""Prebuilt language analyzers, lazily registered on first lookup.

The reference exposes named language analyzers (AnalysisModule prebuilt
registry; Lucene's FrenchAnalyzer, GermanAnalyzer, ...) composed as
standard tokenizer + language-specific filter chain.  Compositions here
follow the Lucene analyzer shapes:

- french:     elision(French articles) + lowercase + stop + stemmer —
              Lucene uses FrenchLightStemFilter; this engine routes to
              its Snowball French (documented deviation).
- german:     lowercase + stop + german_normalization + light_german
              (Lucene GermanAnalyzer shape, same stemmer family).
- spanish:    lowercase + stop + light_spanish (SpanishAnalyzer shape).
- portuguese: lowercase + stop + light_portuguese.
- italian:    elision(Italian articles) + lowercase + stop +
              light_italian.
- russian:    lowercase + stop + Snowball Russian.
- dutch:      lowercase + stop + stemmer_override(DutchAnalyzer's
              DEFAULT_STEM_DICT) + Snowball Dutch.
- swedish / danish / norwegian: lowercase + stop + Snowball
              (Lucene analyzer shape).
- czech:      lowercase + stop + czech stemmer (CzechAnalyzer shape).
- arabic:     lowercase + stop + arabic_normalization + light10 stemmer
              (ArabicAnalyzer shape).
- hindi:      lowercase + hindi_normalization + stop + hindi stemmer
              (HindiAnalyzer shape minus IndicNormalization).

STOP LISTS are curated high-frequency function-word subsets (40-120
words each), NOT the verbatim snowball lists the reference ships — a
documented approximation; supply a custom analyzer with an explicit
``stopwords`` list for exact control.
"""

from __future__ import annotations

__all__ = ["maybe_register", "LANG_ANALYZERS"]

_STOP = {
    "french": """au aux avec ce ces dans de des du elle en et eux il ils
        je la le les leur lui ma mais me mes moi mon ne nos notre nous on
        ou par pas pour qu que qui sa se ses son sur ta te tes toi ton tu
        un une vos votre vous c d j l m n s t y à été étée étant suis es
        est sommes êtes sont sera serai était étais même""",
    "german": """aber alle allem allen aller alles als also am an ander
        andere anderem anderen anderer anderes auch auf aus bei bin bis
        bist da damit dann der den des dem die das dass du er sie es ein
        eine einem einen einer eines für hatte haben hat ich ihr ihre im
        in ist ja kann kein können mich mir mit nach nicht noch nun nur
        oder ohne sehr sich sind so über um und uns unser unter vom von
        vor war waren was wenn werde werden wie wieder will wir wird wo
        zu zum zur""",
    "spanish": """de la que el en y a los del se las por un para con no
        una su al lo como más pero sus le ya o este sí porque esta entre
        cuando muy sin sobre también me hasta hay donde quien desde todo
        nos durante todos uno les ni contra otros ese eso ante ellos e
        esto mí antes algunos qué unos yo otro otras otra él tanto esa
        estos mucho nada muchos cual poco ella estar estas algo nosotros""",
    "portuguese": """de a o que e do da em um para é com não uma os no
        se na por mais as dos como mas foi ao ele das tem à seu sua ou
        ser quando muito há nos já está eu também só pelo pela até isso
        ela entre era depois sem mesmo aos ter seus quem nas me esse
        eles estão você tinha foram essa num nem suas meu às minha""",
    "italian": """ad al allo ai agli alla alle con col coi da dal dallo
        dai dagli dalla dalle di del dello dei degli della delle in nel
        nello nei negli nella nelle su sul sullo sui sugli sulla sulle
        per tra contro io tu lui lei noi voi loro mio mia miei mie tuo
        tua tuoi tue suo sua suoi sue e è che chi questo quello si non
        più quale quanto a o ma se anche come dove perché quando""",
    "russian": """и в во не что он на я с со как а то все она так его но
        да ты к у же вы за бы по только ее мне было вот от меня еще нет
        о из ему теперь когда даже ну ли если уже или ни быть был него
        до вас опять вам ведь там потом себя ничего ей они тут где есть
        для мы тебя их чем была сам без будто чего тоже себе под будет
        тогда кто этот""",
    "dutch": """de en van ik te dat die in een hij het niet zijn is was
        op aan met als voor had er maar om hem dan zou of wat mijn men
        dit zo door over ze zich bij ook tot je mij uit der daar haar
        naar heb hoe heeft hebben deze u want nog zal me zij nu geen
        omdat iets worden toch al waren veel meer doen toen moet ben
        zonder kan hun dus alles onder ja eens hier wie werd altijd
        wordt kunnen ons zelf tegen na wil kon niets uw iemand geweest
        andere""",
    "swedish": """och det att i en jag hon som han på den med var sig
        för så till är men ett om hade de av mig du henne då sin nu har
        inte hans honom skulle hennes där min man ej vid kunde något
        från ut när efter upp vi dem vara vad över än dig kan sina här
        ha mot alla under någon eller allt mycket sedan ju denna själv
        detta åt utan varit hur ingen mitt ni bli blev oss din dessa
        några deras blir mina samma vilken er vår dess inom mellan""",
    "danish": """og i jeg det at en den til er som på de med han af
        for ikke der var mig sig men et har om vi min havde ham hun nu
        over da fra du ud sin dem os op man hans hvor eller hvad skal
        selv her alle vil blev kunne ind når være dog noget ville jo
        deres efter ned skulle denne end dette mit også under have dig
        anden hende mine alt meget sit sine vor mod disse hvis din
        nogle hos blive mange ad bliver hendes været thi jer så""",
    "norwegian": """og i jeg det at en et den til er som på de med han
        av ikke der så var meg seg men har om vi min mitt ha hadde hun
        nå over da ved fra du ut sin dem oss opp man kan hans hvor
        eller hva skal selv her alle vil bli ble blitt kunne inn når
        være kom noen noe ville dere deres kun ja etter ned skulle
        denne for deg si sine sitt mot å dette disse uten ingen din
        ditt blir samme sånn mellom vår hver hvem hvis både bare enn
        fordi før mange også slik vært""",
    "czech": """a aby ale ani ano až bez bude by byl byla byli bylo být
        co což či další do ho i jak jako je jeho jej její jejich jen
        ještě ji jsem jsme jsou jsi k kam kde kdo když ke která které
        který kteří ku mezi mi mně mnou můj může my na nad nám náš ne
        nebo není nic nich ním o od ode on ona oni ono pak po pod podle
        pokud pouze pro proč proto protože první před přes při s se si
        svůj ta tak také takže tato tedy ten tento této tím to toho
        tomu tu ty tyto u už v vám vás váš ve více však všech vy z za
        ze že""",
    "arabic": """من في على و يا أن إن إلى عن أو هو هي هم ما لا لم لن له
        لها لهم ثم أي كل بعد قبل عند قد كان كانت يكون هذا هذه ذلك تلك
        هناك التي الذي الذين حتى إذا كما لكن بل منذ حيث أما بها به أنه
        أنها نحن أنا أنت""",
    "romanian": """şi în a la cu de pe un o este sunt care ce nu se mai
        pentru din că dacă dar sau când cum unde cine am ai are avem au
        fost era fi fie după între până prin despre sub peste acest
        această aceste acestor lor lui ei el ea noi voi eu tu îl îi le
        ne vă mă te lor meu mea tău ta său sa""",
    "hungarian": """a az és hogy nem is de egy ez volt már csak meg mint
        el így ki mi ha vagy még vagyis lesz lehet kell volt voltak van
        vannak ő ők én te mi ti azt ezt aki ami amely amelyek mert mikor
        hol miért hogyan minden nagyon itt ott majd után előtt alatt
        között által ellen fel le be át rá nél hoz tól ról ből""",
    "finnish": """ja on ei se että en oli hän mutta niin kuin myös joka
        jos kun nyt mitä tämä ole sen ovat sitä vain jo mukaan kaikki
        hänen sitten vielä tai siitä olla voi me he ne sinä minä mikä
        missä koska sekä eli vaan sille tässä näin paljon hyvin""",
    "turkish": """ve bir bu da de için ile olarak daha çok en gibi kadar
        sonra ama ancak ya ki mi mu mü ne o şu ben sen biz siz onlar
        her hem ise değil var yok olan olduğu üzere göre karşı doğru
        diye çünkü fakat veya yani hiç bütün bazı şey""",
    "indonesian": """yang dan di ke dari untuk pada dengan dalam ini itu
        adalah akan tidak ada atau juga oleh saya kami kita mereka dia
        ia anda bisa sudah telah masih harus dapat karena jika maka
        tetapi namun serta antara seperti hingga sampai bagi tentang
        secara para lebih sangat hanya agar yaitu bahwa""",
    "galician": """a o e de do da en un unha os as que non se para con
        por unha máis pero como xa ou cando moi sen sobre tamén ata hai
        onde quen desde todo nós durante todos eles elas este esta isto
        entre eu ti el ela nos vos seu súa meu miña teu túa""",
    "hindi": """के का एक में की है यह और से हैं को पर इस कि जो कर मे गया
        करने किया अपने ने नहीं तो ही या हो था तक साथ करना बाद लिए अभी दो
        इसी रहा अपनी जब कोई व जैसे सभी करता तरह उस वह भी""",
}

#: Lucene FrenchAnalyzer / ItalianAnalyzer elision article sets
_FR_ARTICLES = ["l", "m", "t", "qu", "n", "s", "j", "d", "c",
                "jusqu", "quoiqu", "lorsqu", "puisqu"]
_IT_ARTICLES = ["c", "l", "all", "dall", "dell", "nell", "sull", "coll",
                "pell", "gl", "agl", "dagl", "degl", "negl", "sugl",
                "un", "m", "t", "s", "v", "d"]

#: DutchAnalyzer.DEFAULT_STEM_DICT — irregular plural overrides
_NL_STEM_DICT = ["fiets => fiets", "bromfiets => bromfiets",
                 "ei => eier", "kind => kinder"]


def _defs() -> dict:
    def stop(lang: str) -> dict:
        return {"type": "stop", "stopwords": _STOP[lang].split()}
    return {
        "french": [{"type": "elision", "articles": _FR_ARTICLES},
                   "lowercase", stop("french"),
                   {"type": "stemmer", "language": "french"}],
        "german": ["lowercase", stop("german"), "german_normalization",
                   {"type": "stemmer", "language": "light_german"}],
        "spanish": ["lowercase", stop("spanish"),
                    {"type": "stemmer", "language": "light_spanish"}],
        "portuguese": ["lowercase", stop("portuguese"),
                       {"type": "stemmer",
                        "language": "light_portuguese"}],
        "italian": [{"type": "elision", "articles": _IT_ARTICLES},
                    "lowercase", stop("italian"),
                    {"type": "stemmer", "language": "light_italian"}],
        "russian": ["lowercase", stop("russian"),
                    {"type": "stemmer", "language": "russian"}],
        "dutch": ["lowercase", stop("dutch"),
                  {"type": "stemmer_override", "rules": _NL_STEM_DICT},
                  {"type": "stemmer", "language": "dutch"}],
        "swedish": ["lowercase", stop("swedish"),
                    {"type": "stemmer", "language": "swedish"}],
        "danish": ["lowercase", stop("danish"),
                   {"type": "stemmer", "language": "danish"}],
        "norwegian": ["lowercase", stop("norwegian"),
                      {"type": "stemmer", "language": "norwegian"}],
        "czech": ["lowercase", stop("czech"),
                  {"type": "stemmer", "language": "czech"}],
        "arabic": ["lowercase", stop("arabic"), "arabic_normalization",
                   {"type": "stemmer", "language": "arabic"}],
        "romanian": ["lowercase", stop("romanian"),
                     {"type": "stemmer", "language": "romanian"}],
        "hungarian": ["lowercase", stop("hungarian"),
                      {"type": "stemmer", "language": "hungarian"}],
        "finnish": ["lowercase", stop("finnish"),
                    {"type": "stemmer", "language": "finnish"}],
        # TurkishAnalyzer shape: apostrophe strip, then the Turkish
        # dotted/dotless-i lowercase, then stop + Snowball
        "turkish": ["apostrophe",
                    {"type": "lowercase", "language": "turkish"},
                    stop("turkish"),
                    {"type": "stemmer", "language": "turkish"}],
        "indonesian": ["lowercase", stop("indonesian"),
                       {"type": "stemmer", "language": "indonesian"}],
        # GalicianAnalyzer ships the full RSLP-G stemmer; this engine
        # routes to the minimal (plural-only) variant — documented
        # deviation, same family
        "galician": ["lowercase", stop("galician"),
                     {"type": "stemmer", "language": "minimal_galician"}],
        "hindi": ["lowercase", "hindi_normalization", stop("hindi"),
                  {"type": "stemmer", "language": "hindi"}],
    }


LANG_ANALYZERS = tuple(sorted(_defs().keys()))


def maybe_register(name: str):
    """Register + return the prebuilt analyzer `name`, or None if the
    name is not a prebuilt language analyzer."""
    d = _defs()
    if name not in d:
        return None
    from sparksearch.analysis_custom import register_analyzer
    return register_analyzer(name, {"tokenizer": "standard",
                                    "filter": d[name]})
