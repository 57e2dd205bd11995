"""The readability regex set, with JS regex semantics mirrored in Python.

These are the behavioral constants of the Readability algorithm
(reference: ``/root/reference/Sources/SwiftReadability/RegExUtil.swift:5-29``,
canonical upstream ``tmp-readability/Readability.js:137-176``).  They are
pattern *data*, reproduced so our from-scratch engine classifies nodes
identically.

JS regex notes mirrored here:
- ``/\\W+/`` without the unicode flag treats all non-ASCII letters as
  non-word characters; we use an explicit ASCII class.
- ``\\s`` in JS includes NBSP/BOM; see :mod:`.dom` for the whitespace class.
"""

from __future__ import annotations

import re

UNLIKELY_CANDIDATES = re.compile(
    r"-ad-|ai2html|banner|breadcrumbs|combx|comment|community|cover-wrap|"
    r"disqus|extra|footer|gdpr|header|legends|menu|related|remark|replies|"
    r"rss|shoutbox|sidebar|skyscraper|social|sponsor|supplemental|ad-break|"
    r"agegate|pagination|pager|popup|yom-remote",
    re.I,
)
OK_MAYBE_ITS_A_CANDIDATE = re.compile(
    r"and|article|body|column|content|main|mathjax|shadow", re.I
)
POSITIVE = re.compile(
    r"article|body|content|entry|hentry|h-entry|main|page|pagination|post|"
    r"text|blog|story",
    re.I,
)
NEGATIVE = re.compile(
    r"-ad-|hidden|^hid$| hid$| hid |^hid |banner|combx|comment|com-|contact|"
    r"footer|gdpr|masthead|media|meta|outbrain|promo|related|scroll|share|"
    r"shoutbox|sidebar|skyscraper|sponsor|shopping|tags|widget",
    re.I,
)
BYLINE = re.compile(r"byline|author|dateline|writtenby|p-author", re.I)
VIDEOS = re.compile(
    r"//(www\.)?((dailymotion|youtube|youtube-nocookie|player\.vimeo|v\.qq|"
    r"bilibili|live\.bilibili)\.com|(archive|upload\.wikimedia)\.org|"
    r"player\.twitch\.tv)",
    re.I,
)
SHARE_ELEMENTS = re.compile(r"(\b|_)(share|sharedaddy)(\b|_)", re.I)
# ASCII-only tokenizer: JS /\W+/ (no unicode flag) splits on every
# non-[A-Za-z0-9_] including accented/CJK characters.
TOKENIZE = re.compile(r"[^A-Za-z0-9_]+")
HASH_URL = re.compile(r"^#.+")
SRCSET_URL = re.compile(r"(\S+)(\s+[\d.]+[xw])?(\s*(?:,|$))")
B64_DATA_URL = re.compile(r"^data:\s*([^\s;,]+)\s*;\s*base64\s*,", re.I)
COMMAS = re.compile("[\u002c\u060c\ufe50\ufe10\ufe11\u2e41\u2e34\u2e32\uff0c]")
JSONLD_ARTICLE_TYPES = re.compile(
    r"^Article|AdvertiserContentArticle|NewsArticle|AnalysisNewsArticle|"
    r"AskPublicNewsArticle|BackgroundNewsArticle|OpinionNewsArticle|"
    r"ReportageNewsArticle|ReviewNewsArticle|Report|SatiricalArticle|"
    r"ScholarlyArticle|MedicalScholarlyArticle|SocialMediaPosting|"
    r"BlogPosting|LiveBlogPosting|DiscussionForumPosting|TechArticle|"
    r"APIReference$"
)
AD_WORDS = re.compile(
    "^(ad(vertising|vertisement)?|pub(licit\u00e9)?|werb(ung)?|\u5e7f\u544a|"
    "\u0420\u0435\u043a\u043b\u0430\u043c\u0430|Anuncio)$",
    re.I,
)
LOADING_WORDS = re.compile(
    "^((loading|\u6b63\u5728\u52a0\u8f7d|\u0417\u0430\u0433\u0440\u0443\u0437\u043a\u0430|chargement|cargando)(\u2026|\\.\\.\\.)?)$",
    re.I,
)
# image-file sniffing used by lazy-image / noscript handling
IMG_EXT = re.compile(r"\.(jpg|jpeg|png|webp)", re.I)
IMG_EXT_SRCSET = re.compile(r"\.(jpg|jpeg|png|webp)\s+\d")
IMG_EXT_SRC = re.compile(r"^\s*\S+\.(jpg|jpeg|png|webp)\S*\s*$")

UNLIKELY_ROLES = frozenset(
    ("menu", "menubar", "complementary", "navigation", "alert", "alertdialog", "dialog")
)
DEFAULT_TAGS_TO_SCORE = frozenset(
    ("section", "h2", "h3", "h4", "h5", "h6", "p", "td", "pre")
)
DIV_TO_P_ELEMS = frozenset(
    ("blockquote", "dl", "div", "img", "ol", "p", "pre", "table", "ul")
)
ALTER_TO_DIV_EXCEPTIONS = frozenset(("div", "article", "section", "p", "ol", "ul"))
PRESENTATIONAL_ATTRIBUTES = (
    "align", "background", "bgcolor", "border", "cellpadding", "cellspacing",
    "frame", "hspace", "rules", "style", "valign", "vspace",
)
DEPRECATED_SIZE_ATTRIBUTE_ELEMS = frozenset(("table", "th", "td", "hr", "pre"))
PHRASING_ELEMS = frozenset(
    (
        "abbr", "audio", "b", "bdo", "br", "button", "cite", "code", "data",
        "datalist", "dfn", "em", "embed", "i", "img", "input", "kbd", "label",
        "mark", "math", "meter", "noscript", "object", "output", "progress",
        "q", "ruby", "samp", "script", "select", "small", "span", "strong",
        "sub", "sup", "textarea", "time", "var", "wbr",
    )
)
CLASSES_TO_PRESERVE = ("page",)
