"""Synthetic grammy/spotify fixtures (FIXTURES.md §A).

Deterministic (seeded) generators producing small tables that hit
every branch of the pipeline: album match, exact song match, prefix
fallback, no match, best-new-artist, multi-artist separator strings,
''/NULL sentinel rows, duplicate track_ids across genres, and
containment false-positive probes.
"""

from __future__ import annotations

import random
import string

import pandas as pd

_GENRES = ["pop", "rock", "acoustic", "dance", "latin", "metal"]
_CATEGORIES_SONG = [
    "Song Of The Year",
    "Best Pop Performance",
    "Record Of The Year",  # 'record' does NOT contain a keyword → routes 'other'
    "Best Rock Song",
    "Best Music Video",
    "Best Country Composition",
    "Best Dance Recording",
    "Best Metal Track",
]
_CATEGORIES_OTHER = [
    "Album Of The Year",
    "Best Pop Album",
    "Best New Artist",
    "Producer Of The Year",
]


def _track_id(rng: random.Random) -> str:
    return "".join(rng.choices(string.ascii_letters + string.digits, k=22))


def make_spotify(n_tracks: int = 400, seed: int = 7) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    idx = 0
    for i in range(n_tracks):
        artist_pool = [
            f"artist {i % 37}",
            f"Artist {i % 37};Featured {i % 11}",
            f"The Band {i % 23} & Co",
            "Nanci Griffith" if i % 53 == 0 else f"solo{i % 29}",
        ]
        artists = artist_pool[i % 4]
        track = f"track title {i}" if i % 3 else f"Track Title {i} (Live Version)"
        album = f"album {i % 60}"
        tid = _track_id(rng)
        # ~25% of tracks appear under 2 genres (duplicate track_ids,
        # identical except track_genre — eda.ipynb cell 13 shape).
        n_genres = 2 if i % 4 == 0 else 1
        pop = rng.randint(0, 100)
        for g in range(n_genres):
            rows.append(
                {
                    "Unnamed: 0": idx,
                    "track_id": tid,
                    "artists": artists,
                    "album_name": album,
                    "track_name": track,
                    "popularity": pop,
                    "duration_ms": rng.randint(60_000, 600_000),
                    "explicit": bool(i % 5 == 0),
                    "danceability": round(rng.random(), 3),
                    "energy": round(rng.random(), 3),
                    "key": rng.randint(0, 11),
                    "loudness": round(-20 * rng.random(), 3),
                    "mode": rng.randint(0, 1),
                    "speechiness": round(rng.random(), 3),
                    "acousticness": round(rng.random(), 3),
                    "instrumentalness": round(rng.random(), 3),
                    "liveness": round(rng.random(), 3),
                    "valence": round(rng.random(), 3),
                    "tempo": round(60 + 140 * rng.random(), 3),
                    "time_signature": rng.randint(1, 5),
                    "track_genre": _GENRES[(i + g) % len(_GENRES)],
                }
            )
            idx += 1
    # Same (artists, track) under different popularity → argmax-dedup
    # observable (FIXTURES.md A2).
    dup = dict(rows[0])
    dup["Unnamed: 0"] = idx
    dup["track_id"] = _track_id(rng)
    dup["popularity"] = min(100, rows[0]["popularity"] + 1)
    dup["track_genre"] = "remix"
    rows.append(dup)
    # ≥1 NULL artists/album/track row.
    null_row = dict(rows[1])
    null_row["Unnamed: 0"] = idx + 1
    null_row["track_id"] = _track_id(rng)
    null_row["artists"] = None
    null_row["album_name"] = None
    null_row["track_name"] = None
    rows.append(null_row)
    return pd.DataFrame(rows)


def make_grammy(n: int = 240, seed: int = 11) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        if i % 12 == 0:
            cat = "Album Of The Year"
            nominee = f"album {i % 60}"  # J1: matches a spotify album
            artist = ""  # blank → imputable
        elif i % 12 == 1:
            cat = "Song Of The Year"
            nominee = f"track title {3 * (i % 50) + 1}"  # exact song match (i%3!=0 rows)
            artist = f"artist {(3 * (i % 50) + 1) % 37}"
        elif i % 12 == 2:
            cat = "Best Pop Performance"
            nominee = f"Track Title {3 * (i % 33)} (With Social House)"  # prefix fallback
            artist = f"artist {(3 * (i % 33)) % 37}"
        elif i % 12 == 3:
            cat = "Best New Artist"
            nominee = f"New Star {i}"
            artist = ""  # F9: artist := nominee
        elif i % 12 == 4:
            cat = "Best Rock Song"
            nominee = f"no such song {i}"  # no match at all
            artist = f"Unmatched & Unknown feat. Nobody {i}"
        elif i % 12 == 5:
            cat = "Producer Of The Year"
            nominee = ""
            artist = ""  # P1: dropped
        elif i % 12 == 6:
            cat = "Best Music Video"
            nominee = f"track title {3 * (i % 40) + 2}"
            artist = None  # NULL (not '') → astype(str) 'nan' quirk in strict
        else:
            cat = rng.choice(_CATEGORIES_SONG + _CATEGORIES_OTHER)
            nominee = f"Some Nominee {i}"
            artist = f"Some Artist {i % 80} and Friends"
        year = 1958 + (i % 62)
        rows.append(
            {
                "id": i + 1,
                "year": year,
                "title": f"{year - 1957}th Annual GRAMMY Awards ({year})",
                "published_at": "2020-05-19T05:10:28-07:00",
                "updated_at": "2020-05-19T05:10:28-07:00",
                "category": cat,
                "nominee": nominee,
                "artist": artist,
                "workers": f"Worker {i}, producer" if i % 3 else "",
                "img": f"https://img.example/{i}.jpg" if i % 4 else "",
                "winner": "True",
            }
        )
    return pd.DataFrame(rows)
