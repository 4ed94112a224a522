"""Deterministic listing-page HTML fixtures.

The source layer is tested against recorded/synthetic HTML, never the
live site (SURVEY §7 Phase 4). This builder writes a set of
``page_{n}.html`` files whose content is a pure function of the seed —
cards include every parse quirk the golden tests cover: badge
camel-case, missing anchors (null link), duplicate links across pages
(keep-first dedup food), unit-less prices, Indonesian decimal commas.
"""

from __future__ import annotations

import os
import random

ADMINS = ["Jakarta Selatan", "Jakarta Timur", "Bogor", "Depok", "Bekasi"]
PRICES = [
    "Rp 2,5 Miliar",
    "Rp 950 Juta",
    "Rp 1,75 Miliar",
    "Rp 500 Ribu",
    "Rp 1,2 Triliun",
    "Rp 850000000",  # unit-less: parses to null (documented divergence)
    "hubungi kami",
]
BADGES = ["RumahKPRBisaNego", "ApartemenFullFurnished", "VillaDekatPantai"]


def card_html(
    i: int,
    link_path: str | None,
    price: str,
    admin: str,
    badge: str,
    n_bed: int,
    lot: int,
    bld: int,
) -> str:
    anchor = (
        f'<a class="quick-label-badge" href="/promo">ad</a>'
        f'<a href="{link_path}">listing</a>'
        if link_path
        else '<a class="quick-label-badge" href="/promo">ad</a>'
    )
    return (
        '<div class="card-featured__middle-section">'
        f"{anchor}"
        f'<div class="card-featured__middle-section__header-badge"><span>{badge}</span></div>'
        f"<h2>Listing {i}</h2>"
        f'<div class="card-featured__middle-section__price"><strong>{price}</strong></div>'
        f"<span>Dijual</span><span>{admin}</span>"
        f'<span class="attribute-text">{n_bed}</span>'
        f'<span class="attribute-text">{n_bed - 1}</span>'
        f'<span class="attribute-text">1</span>'
        f'<div class="attribute-info">Tanah : {lot} m&#178;</div>'
        f'<div class="attribute-info">Bangunan : {bld} m&#178;</div>'
        "</div>"
    )


def write_fixture_pages(
    out_dir: str,
    num_pages: int = 4,
    cards_per_page: int = 12,
    seed: int = 42,
    empty_after: int | None = None,
) -> str:
    """Write ``page_1..num_pages.html``; pages after ``empty_after``
    contain no cards (early-stop food). ~10% of cards have no real
    anchor (null link); ~15% repeat an earlier link (dup food)."""
    rng = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)
    seen_links: list[str] = []
    i = 0
    for page in range(1, num_pages + 1):
        cards = []
        if empty_after is None or page <= empty_after:
            for _ in range(cards_per_page):
                i += 1
                roll = rng.random()
                if roll < 0.10:
                    link = None
                elif roll < 0.25 and seen_links:
                    link = rng.choice(seen_links)
                else:
                    link = f"/properti/{i}"
                    seen_links.append(link)
                cards.append(
                    card_html(
                        i,
                        link,
                        rng.choice(PRICES),
                        rng.choice(ADMINS),
                        rng.choice(BADGES),
                        n_bed=rng.randint(2, 6),
                        lot=rng.randint(60, 400),
                        bld=rng.randint(36, 300),
                    )
                )
        page_html = "<html><body>" + "".join(cards) + "</body></html>"
        path = os.path.join(out_dir, f"page_{page}.html")
        # Atomic per-file publish: the fixture dir is shared (the
        # DuckDB oracle and the listing DataSource both read it, and
        # parallel sessions re-generate it at import), so a reader
        # must never observe a truncated page. Content is a pure
        # function of the seed, so an existing identical file is
        # left untouched (no mtime churn, no window at all).
        try:
            with open(path) as f:
                if f.read() == page_html:
                    continue
        except OSError:
            pass
        import tempfile as _tf

        fd, tmp = _tf.mkstemp(dir=out_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            f.write(page_html)
        os.replace(tmp, path)
    return out_dir
