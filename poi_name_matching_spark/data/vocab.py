"""Frozen vocabulary for the synthetic transcript/pair generators.

Entity-bearing phrases are modeled on the reference's POI names (e.g.
"Park Avenue Pizza", "Cedar Fork Elementary School" — see the labeled
pickles loaded at ``load_data/baseline.py:118-123`` and the worked example
at ``load_data/test_hybrid_func.py:430``) so the tokenizer / stopword /
stemmer paths are exercised exactly as the reference exercises them.

Everything here is a literal constant — no randomness, no I/O.
"""

from __future__ import annotations

# ~60 given-name-ish / place-name-ish leading words
NAME_WORDS = [
    "park", "cedar", "oak", "maple", "pine", "willow", "birch", "elm",
    "lake", "river", "hill", "valley", "spring", "forest", "meadow",
    "sunset", "sunrise", "harbor", "bay", "ocean", "mountain", "canyon",
    "golden", "silver", "copper", "iron", "crystal", "diamond", "ruby",
    "north", "south", "east", "west", "central", "union", "liberty",
    "franklin", "washington", "jefferson", "lincoln", "madison", "monroe",
    "dillard", "champlain", "jewett", "laspadas", "oakridge", "brookside",
    "fairview", "glenwood", "hillcrest", "kingsway", "lakeshore",
    "granville", "cambie", "broadway", "hastings", "denman", "davie",
]

# POI category words (many are stemmed non-trivially by Snowball)
TYPE_WORDS = [
    "pizza", "pizzeria", "cafe", "coffee", "bakery", "deli", "diner",
    "restaurant", "grill", "bistro", "tavern", "pub", "bar", "lounge",
    "market", "grocery", "pharmacy", "bank", "library", "school",
    "elementary", "secondary", "academy", "college", "university",
    "church", "temple", "chapel", "clinic", "hospital", "dental",
    "orthopedic", "veterinary", "salon", "barber", "spa", "fitness",
    "gym", "yoga", "studio", "gallery", "museum", "theatre", "cinema",
    "hotel", "motel", "inn", "hostel", "laundry", "cleaners", "hardware",
    "florist", "jewelers", "optical", "books", "records", "antiques",
]

# street-suffix words with the abbreviation pairs seen in the reference's
# true matches ("Dillard Drive Elementary School" / "Dillard Dr Elementary")
STREET_WORDS = [
    "avenue", "street", "drive", "road", "boulevard", "lane", "court",
    "place", "square", "plaza", "mall", "center", "crossing", "station",
    "heights", "gardens", "terrace", "commons", "landing", "point",
]

ABBREVIATIONS = {
    "avenue": "ave",
    "street": "st",
    "drive": "dr",
    "road": "rd",
    "boulevard": "blvd",
    "lane": "ln",
    "court": "ct",
    "place": "pl",
    "square": "sq",
    "center": "ctr",
    "elementary": "elem",
    "school": "sch",
    "saint": "st",
    "mount": "mt",
    "fort": "ft",
    "company": "co",
    "brothers": "bros",
    "restaurant": "rest",
    "apartments": "apts",
    "national": "natl",
}

# conversational filler (3-20-token turns are padded from this pool);
# includes short stopwords so filter_stopwords (reference tokenizer.py:52-58)
# actually removes something
FILLER_WORDS = [
    "the", "a", "an", "and", "or", "but", "if", "so", "as", "at", "by",
    "for", "in", "of", "on", "to", "up", "is", "am", "are", "was", "be",
    "i", "me", "my", "we", "you", "he", "she", "it", "its", "not", "no",
    "can", "you", "please", "find", "look", "search", "near", "nearby",
    "open", "hours", "today", "tomorrow", "morning", "evening", "best",
    "good", "great", "cheap", "expensive", "close", "far", "walk",
    "directions", "address", "phone", "number", "website", "menu",
    "review", "reviews", "rating", "star", "stars", "book", "reserve",
    "table", "order", "delivery", "pickup", "takeout", "location",
    "where", "what", "when", "how", "much", "many", "does", "do", "did",
    "thanks", "thank", "sure", "here", "there", "found", "results",
    "option", "options", "recommend", "suggest", "show", "list", "map",
    "city", "town", "downtown", "uptown", "district", "area", "zone",
    "block", "corner", "next", "before", "after", "about", "around",
    "friendly", "friends", "mouse", "mice", "china", "chinese", "above",
    "both", "fairs", "fairly", "cafes", "dave", "hello", "help", "need",
    "want", "going", "visit", "trip", "plan", "meeting", "lunch",
    "dinner", "breakfast", "brunch", "snack", "drink", "drinks", "food",
    "parking", "transit", "bus", "train", "bike", "car", "minutes",
    "blocks", "miles", "north", "south", "east", "west", "left", "right",
    # extension to ~500 words (FIXTURES.md §1) — common conversational /
    # task vocabulary; larger pool keeps cross-entity signatures from
    # overlapping by chance
    "account", "action", "active", "actually", "added", "address",
    "advice", "afternoon", "again", "agent", "agree", "ahead", "airport",
    "almost", "already", "also", "always", "amazing", "amount", "another",
    "answer", "anything", "anyway", "apartment", "appointment", "april",
    "arrive", "article", "asking", "august", "available", "avoid",
    "awesome", "back", "bad", "bag", "based", "basic", "beach", "because",
    "been", "begin", "being", "believe", "below", "better", "between",
    "big", "bill", "birthday", "bit", "booking", "boss", "bottle", "box",
    "break", "bring", "brother", "budget", "building", "busy", "button",
    "buy", "call", "called", "calling", "came", "cancel", "card", "care",
    "case", "cash", "catch", "cause", "celebrate", "certain", "chance",
    "change", "charge", "check", "checked", "child", "children", "choice",
    "choose", "chosen", "claim", "class", "clean", "clear", "click",
    "client", "clock", "closed", "closer", "clothes", "code", "cold",
    "come", "coming", "comment", "common", "company", "compare",
    "complete", "computer", "confirm", "contact", "continue", "cook",
    "cool", "copy", "cost", "could", "count", "country", "couple",
    "course", "cover", "create", "credit", "current", "customer", "cut",
    "daily", "date", "daughter", "day", "days", "deal", "december",
    "decide", "deep", "definitely", "depends", "design", "desk", "detail",
    "details", "device", "different", "difficult", "direct", "discount",
    "document", "dog", "done", "door", "double", "down", "download",
    "drive", "driver", "during", "each", "early", "easy", "eat", "either",
    "else", "email", "end", "enough", "enter", "entire", "especially",
    "estimate", "even", "event", "ever", "every", "everyone",
    "everything", "exact", "example", "excellent", "except", "expect",
    "experience", "extra", "family", "fast", "father", "favorite",
    "february", "feel", "few", "file", "fill", "final", "finally", "fine",
    "finish", "first", "fit", "fix", "flight", "floor", "follow",
    "forget", "form", "forward", "free", "fresh", "friday", "from",
    "front", "full", "further", "future", "game", "gave", "general",
    "get", "getting", "gift", "give", "given", "glad", "goes", "gone",
    "got", "group", "guess", "guest", "guide", "had", "half", "hand",
    "happen", "happy", "hard", "has", "have", "having", "head", "hear",
    "heard", "heavy", "high", "him", "his", "history", "hold", "home",
    "hope", "hot", "hour", "house", "however", "idea", "image",
    "important", "include", "info", "information", "inside", "instead",
    "interest", "invite", "issue", "item", "january", "job", "join",
    "july", "june", "just", "keep", "key", "kind", "kitchen", "know",
    "known", "large", "last", "late", "later", "learn", "least", "leave",
    "less", "level", "life", "like", "likely", "line", "link", "little",
    "live", "local", "long", "longer", "looking", "lot", "love", "low",
    "made", "main", "make", "making", "manager", "march", "matter",
    "may", "maybe", "meal", "mean", "member", "message", "middle",
    "might", "mind", "mine", "moment", "monday", "money", "month",
    "more", "most", "mother", "move", "movie", "music", "must", "name",
    "nearest", "never", "new", "news", "nice", "night", "none", "note",
    "nothing", "november", "now", "october", "off", "offer", "office",
    "often", "okay", "old", "once", "one", "online", "only", "other",
    "our", "out", "outside", "over", "own", "page", "paid", "paper",
    "part", "party", "pass", "past", "pay", "payment", "people",
    "perfect", "person", "photo", "pick", "picture", "piece", "place",
    "point", "possible", "post", "prefer", "price", "print", "probably",
    "problem", "process", "product", "project", "provide", "public",
    "pull", "purchase", "push", "put", "question", "quick", "quite",
    "rain", "rate", "rather", "reach", "read", "ready", "real", "really",
    "reason", "receive", "recent", "record", "refund", "regular",
    "remember", "remove", "rent", "repeat", "reply", "report", "request",
    "return", "ride", "room", "run", "said", "same", "saturday", "save",
    "saw", "say", "schedule", "screen", "search", "season", "second",
    "see", "seem", "seen", "select", "sell", "send", "sent", "september",
    "service", "set", "setting", "share", "shop", "shopping", "should",
    "side", "sign", "simple", "since", "sister", "site", "size", "small",
    "some", "someone", "something", "soon", "sorry", "sound", "space",
    "speak", "special", "spend", "spot", "staff", "start", "status",
    "stay", "still", "stop", "store", "story", "street", "strong",
    "stuff", "submit", "such", "summer", "sunday", "support", "switch",
    "system", "take", "taken", "talk", "team", "tell", "term", "text",
    "than", "them", "then", "they", "thing", "think", "third", "this",
    "those", "though", "thought", "three", "thursday", "ticket", "time",
    "tip", "title", "together", "told", "took", "top", "total", "touch",
    "tour", "track", "trade", "travel", "tried", "try", "tuesday",
    "turn", "two", "type", "under", "understand", "until", "update",
    "use", "used", "user", "using", "usually", "value", "very", "video",
    "view", "wait", "waiting", "walking", "warm", "watch", "water",
    "way", "wear", "weather", "wednesday", "week", "weekend", "well",
    "went", "were", "which", "while", "white", "whole", "why", "wife",
    "will", "window", "winter", "wish", "with", "within", "without",
    "wonder", "word", "work", "working", "world", "worth", "would",
    "write", "wrong", "year", "yes", "yesterday", "yet", "your", "zero",
]

ROLES = ["user", "assistant", "tool"]
TOOLS = ["search", "code", "browse", None]
