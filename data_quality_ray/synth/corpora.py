"""Built-in miniature language corpora, PII templates and a toxicity lexicon.

These play the role of the reference's label vocabulary (`class_mapping`,
eeg_datasets.py:40): tiny, broadcast-by-closure lookup tables. The word lists
are ordinary high-frequency vocabulary (public knowledge); the "toxicity"
lexicon is a set of synthetic pseudo-profanities so tests stay readable.
"""

from __future__ import annotations

# ~60 frequent words per language — enough signal for a char-n-gram langid
# model to separate these four languages essentially perfectly.
WORDS: dict[str, list[str]] = {
    "en": (
        "the of and to in is was for that with his they this have from one had "
        "word but not what all were when your can said there use each which she "
        "how their will other about out many then them these some would make "
        "like him into time has look two more write see number could people my "
        "than first water been called who day may down side now find"
    ).split(),
    "de": (
        "der die und in den von zu das mit sich des auf für ist im dem nicht "
        "ein eine als auch es an werden aus er hat dass sie nach wird bei einer "
        "um am sind noch wie einem über einen so zum haben nur oder aber vor "
        "zur bis mehr durch man sein wurde sei schon wenn während können"
    ).split(),
    "fr": (
        "le de un être et à il avoir ne je son que se qui dans en du elle au "
        "ce pas pour par sur faire plus dire me on mon lui nous comme mais "
        "pouvoir avec tout y aller voir bien où sans tu ou leur homme si deux "
        "mari moi vouloir te femme venir quand grand celui trop notre"
    ).split(),
    "es": (
        "de la que el en y a los del se las por un para con no una su al lo "
        "como más pero sus le ya o este sí porque esta entre cuando muy sin "
        "sobre también me hasta hay donde quien desde todo nos durante todos "
        "uno les ni contra otros ese eso ante ellos e esto mí antes"
    ).split(),
}

LANGS: tuple[str, ...] = tuple(sorted(WORDS))  # ("de", "en", "es", "fr")

# Zipf-ish language mix for generated rows — deliberately skewed so the
# per-language stats groupby exercises the salted-aggregation path
# (SURVEY.md §7.3: langid-induced skew).
LANG_WEIGHTS: dict[str, float] = {"en": 0.52, "de": 0.20, "fr": 0.17, "es": 0.11}

# Consonant-cluster syllables for the "junk" pseudo-language (wrong-lang
# planted class): pronounceable-ish but out-of-distribution for all four LMs.
JUNK_SYLLABLES: list[str] = (
    "zrk vxq jzw qkx wvz xfj gzq pzk tkz kqv zzf xxv qjz wxk fzv zqk vkx jqx "
    "bzx kzz qvw xzp zwq kxj"
).split()

GIBBERISH_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789@#$%&*"

# Synthetic pseudo-profanities (kept family-friendly on purpose); the scrub
# stage masks them with <TOX> and the decision stage counts them as a defect.
TOXIC_LEXICON: tuple[str, ...] = (
    "frakk", "frakking", "smeghead", "gorram", "feldercarb", "drokk",
    "belgium", "zarking",
)

TOX_MASK = "<TOX>"
EMAIL_MASK = "<EMAIL>"
PHONE_MASK = "<PHONE>"
ID_MASK = "<ID>"

EMAIL_DOMAINS = ["example.com", "mail.test", "web.example.org", "post.example.net"]
EMAIL_USERS = ["alice", "bob.smith", "carol_99", "dave-jones", "erin.k", "frank2"]


def make_email(rng) -> str:
    return f"{EMAIL_USERS[rng.integers(len(EMAIL_USERS))]}@{EMAIL_DOMAINS[rng.integers(len(EMAIL_DOMAINS))]}"


def make_phone(rng) -> str:
    return f"+{rng.integers(1, 99)} {rng.integers(100, 999)}-{rng.integers(100, 999)}-{rng.integers(1000, 9999)}"


def make_id(rng) -> str:
    return f"{rng.integers(100, 999)}-{rng.integers(10, 99)}-{rng.integers(1000, 9999)}"
