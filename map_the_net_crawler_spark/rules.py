"""Single source of truth for the reference's filter / classification rules.

Both the Spark Column pipeline (functions/filters.py, functions/classify.py)
and the sequential Python oracle (oracle/pyref.py) are generated from these
constants, so the two cannot drift.

Sources in the reference:
- excluded extensions: domain_collector.py:78-93
- excluded URL/domain regex patterns: domain_collector.py:96-124
- tracking params / query limits: domain_collector.py:166-175
- path-segment rules: domain_collector.py:181-191
- link-text rules: domain_collector.py:193-200
- domain-format regex: domain_collector.py:1305-1312
- category keyword chain: domain_collector.py:318-417 (order-sensitive!)
"""

from __future__ import annotations

# domain_collector.py:78-93 — lowercased path must not end with any of these.
EXCLUDED_EXTENSIONS: tuple[str, ...] = (
    # Images
    ".jpg", ".jpeg", ".png", ".gif", ".bmp", ".tiff", ".svg", ".webp", ".ico",
    # Documents
    ".pdf", ".doc", ".docx", ".xls", ".xlsx", ".ppt", ".pptx", ".txt", ".rtf",
    # Archives
    ".zip", ".rar", ".7z", ".tar", ".gz", ".bz2",
    # Media
    ".mp3", ".mp4", ".avi", ".mov", ".wmv", ".flv", ".wav", ".ogg",
    # Executables
    ".exe", ".msi", ".dmg", ".pkg", ".deb", ".rpm",
    # Code files
    ".js", ".css", ".xml", ".json", ".csv", ".sql",
    # Other
    ".log", ".tmp", ".bak", ".old", ".cache",
)

# domain_collector.py:96-121 — re.search over the LOWERCASED full url (or
# domain), patterns compiled with re.IGNORECASE.  Order preserved (first
# match wins for the exclusion *reason*; any match excludes).
EXCLUDED_PATTERNS: tuple[str, ...] = (
    r"analytics", r"tracking", r"pixel", r"beacon",
    r"/api/", r"/rest/", r"/graphql", r"/swagger", r"/docs",
    r"/admin", r"/wp-admin", r"/phpmyadmin", r"/cpanel",
    r"/sitemap", r"/robots\.txt", r"/favicon\.ico",
    r"/cart", r"/checkout", r"/payment", r"/order",
    r"/login", r"/logout", r"/register", r"/signup", r"/profile",
    r"/search", r"/filter", r"/sort", r"/page",
    r"/contact", r"/about", r"/privacy", r"/terms", r"/help",
    r"^[^.]+\.itch\.io$", r"^[^.]+\.github\.io$", r"^[^.]+\.wordpress\.com$",
)

# domain_collector.py:171-175 — param NAME containing any of these (substring,
# case-insensitive) excludes the URL.
TRACKING_PARAM_SUBSTRINGS: tuple[str, ...] = (
    "utm_", "fbclid", "gclid", "ref", "source", "campaign",
)

MAX_QUERY_PARAMS = 10      # domain_collector.py:168
MAX_URL_LENGTH = 500       # domain_collector.py:178
MAX_PATH_SEGMENTS = 8      # domain_collector.py:183

# domain_collector.py:186-191
NON_CONTENT_FIRST_SEGMENTS: tuple[str, ...] = (
    "api", "admin", "assets", "static", "cdn", "images", "img", "css", "js",
)

# domain_collector.py:197-199
NON_CONTENT_LINK_TEXTS: tuple[str, ...] = (
    "click here", "read more", "learn more", "continue", "next", "previous",
)

MIN_LINK_TEXT_LEN = 2      # domain_collector.py:194-195

# domain_collector.py:1310
DOMAIN_FORMAT_REGEX = (
    r"^[a-zA-Z0-9]([a-zA-Z0-9\-]{0,61}[a-zA-Z0-9])?"
    r"(\.[a-zA-Z0-9]([a-zA-Z0-9\-]{0,61}[a-zA-Z0-9])?)*$"
)

# domain_collector.py:318-417 — first-match-wins keyword chain over
# lower(title + ' ' + description + ' ' + domain).  Substring containment,
# exactly as the reference's `word in lowered`.  Order is semantic.
CATEGORY_RULES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("blog", ("blog", "post", "journal")),
    ("ecommerce", ("shop", "store", "buy", "ecommerce", "cart", "product",
                   "sale", "deal", "outlet", "retail", "market")),
    ("news", ("news", "media", "press", "magazine", "gazette", "bulletin",
              "headline", "reporter", "newspaper")),
    ("forum", ("forum", "community", "discussion", "board", "thread",
               "topic", "messageboard", "chat")),
    ("education", ("university", "college", "school", "edu", "academy",
                   "institute", "campus", "faculty", "student", "alumni")),
    ("government", ("gov", "government", "municipal", "state", "federal",
                    "ministry", "council", "parliament", "senate", "congress")),
    ("reference", ("wiki", "encyclopedia", "reference", "dictionary",
                   "glossary", "manual", "howto", "faq")),
    ("personal", ("portfolio", "resume", "cv", "bio", "aboutme", "profile",
                  "personal", "homepage")),
    ("software", ("software", "app", "download", "tool", "platform",
                  "service", "cloud", "saas", "opensource")),
    ("health", ("health", "medical", "clinic", "hospital", "doctor",
                "pharmacy", "wellness", "care", "medicine", "dental",
                "therapy")),
    ("finance", ("finance", "bank", "money", "loan", "credit", "investment",
                 "fund", "insurance", "mortgage", "accounting", "tax")),
    ("travel", ("travel", "hotel", "flight", "tourism", "trip", "tour",
                "booking", "destination", "holiday", "cruise", "airline")),
    ("food", ("restaurant", "food", "cafe", "bar", "dining", "menu",
              "cuisine", "eatery", "bistro", "pub", "grill", "kitchen")),
    ("sports", ("sports", "game", "team", "league", "match", "tournament",
                "score", "athlete", "coach", "stadium", "fitness", "gym")),
    ("arts", ("art", "gallery", "museum", "exhibit", "artist", "painting",
              "sculpture", "theatre", "concert", "music", "band", "film",
              "movie", "cinema", "festival")),
    ("science", ("science", "research", "lab", "technology", "engineering",
                 "math", "stem", "physics", "chemistry", "biology",
                 "innovation")),
    ("real_estate", ("real estate", "property", "housing", "apartment",
                     "rent", "home", "condo", "realtor", "broker")),
    ("jobs", ("job", "career", "employment", "work", "vacancy", "recruit",
              "hire", "resume", "cv")),
    ("automotive", ("automotive", "car", "vehicle", "motor", "auto",
                    "garage", "dealer", "truck", "bike")),
    ("fashion", ("fashion", "clothing", "apparel", "boutique", "style",
                 "designer", "shoes", "accessory", "jewelry")),
    ("kids", ("kids", "children", "toys", "games", "play", "childcare",
              "nursery", "preschool")),
    ("environment", ("environment", "eco", "green", "nature", "wildlife",
                     "conservation", "sustain", "climate")),
    ("religion", ("religion", "church", "temple", "mosque", "faith",
                  "spiritual", "bible", "quran", "torah", "worship")),
    ("adult", ("adult", "sex", "porn", "xxx", "escort", "dating", "singles")),
    ("security", ("security", "cyber", "privacy", "infosec", "hacker",
                  "malware", "virus", "firewall")),
    ("logistics", ("logistics", "shipping", "delivery", "supply",
                   "warehouse", "freight", "transport", "cargo")),
    ("construction", ("construction", "builder", "contractor",
                      "architecture", "engineer", "design", "remodel",
                      "renovate")),
    ("energy", ("energy", "power", "solar", "wind", "electric", "utility",
                "oil", "gas", "nuclear")),
    ("legal", ("law", "legal", "attorney", "lawyer", "court", "justice",
               "case", "trial", "judge")),
    ("consulting", ("consult", "advisory", "coach", "mentor", "counsel",
                    "strategy", "management")),
    ("events", ("event", "conference", "expo", "summit", "meetup",
                "webinar", "workshop")),
    ("pets", ("pet", "animal", "vet", "veterinary", "dog", "cat", "bird",
              "fish", "horse")),
    ("photography", ("photography", "photo", "camera", "picture", "image",
                     "gallery")),
    ("language", ("translation", "language", "linguistics", "dictionary",
                  "thesaurus", "grammar")),
    ("hardware", ("hardware", "electronics", "gadget", "device",
                  "component", "chip", "circuit")),
    ("hosting", ("hosting", "server", "domain", "dns", "webhost", "cloud",
                 "vps")),
    ("printing", ("printing", "print", "press", "publisher", "magazine")),
    ("auction", ("auction", "bid", "bidding", "lot", "hammer")),
    ("charity", ("charity", "ngo", "nonprofit", "foundation", "donate",
                 "volunteer")),
    ("agriculture", ("agriculture", "farm", "farming", "crop", "harvest",
                     "agro", "ranch")),
    ("mining", ("mining", "mine", "miner", "ore", "coal", "gold", "silver")),
    ("space", ("space", "astronomy", "planet", "star", "satellite",
               "rocket", "nasa")),
    ("military", ("military", "army", "navy", "airforce", "defense", "war",
                  "battle")),
    ("transport", ("transport", "bus", "train", "metro", "subway", "tram",
                   "taxi", "cab")),
    ("miscellaneous", ("blog", "misc", "other", "general", "info", "site",
                       "web")),
)

DEFAULT_CATEGORY = "miscellaneous"  # domain_collector.py:416-417


def categorize(title: str | None, description: str | None, domain: str) -> str:
    """Reference category heuristic (domain_collector.py:318-417).

    First-match-wins substring chain over lower(title+' '+desc+' '+domain).
    """
    lowered = f"{title or ''} {description or ''} {domain}".lower()
    for cat, words in CATEGORY_RULES:
        if any(w in lowered for w in words):
            return cat
    return DEFAULT_CATEGORY


def derive_tags(meta_keywords: str | None, domain: str, category: str) -> list[str]:
    """Reference tag derivation (domain_collector.py:419-451).

    meta keywords split on ',', stripped+lowercased; + subdomain part (if
    any), SLD, TLD; + category; returned sorted (set semantics).
    """
    tags: set[str] = set()
    if meta_keywords:
        for tag in meta_keywords.split(","):
            tag = tag.strip().lower()
            if tag:
                tags.add(tag)
    parts = domain.split(".")
    if len(parts) > 2:
        tags.add(parts[0])
    if len(parts) >= 2:
        tags.add(parts[-2])
    tags.add(parts[-1])
    tags.add(category)
    return sorted(tags)
