"""Independent pandas replay of the shipped reference semantics
(strict mode) — the golden-producing oracle for pipeline tests.

This is a re-implementation from the behavioral spec in SURVEY.md
§2/§3 (not a copy of the reference DAG): vectorized where the
reference loops, and with the engine's two documented deltas applied
(deterministic argmax tiebreaks; literal — not regex — containment).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

SONG_KEYWORDS = ["song", "performance", "recording", "music", "composition", "track"]
_SEP = re.compile(r"\s*(?:feat\.|featuring|ft\.|&|and)\s*")
_WS = re.compile(r"\s+")

FINAL_DROP = [
    "id",
    "artists",
    "category_norm",
    "nominee_norm",
    "artist_norm",
    "Unnamed: 0",
    "track_name_norm",
    "album_name_norm",
    "artists_orig",
    "artists_norm",
    "time_signature",
]
FLOAT_COLS = [
    "danceability",
    "energy",
    "loudness",
    "speechiness",
    "acousticness",
    "instrumentalness",
    "liveness",
    "valence",
    "tempo",
]
INT_COLS = ["popularity", "duration_ms", "key", "mode"]


def _norm_full(s: pd.Series) -> pd.Series:
    """normalize_text over astype(str) values (strict: NaN → 'nan')."""
    out = s.astype(str).str.lower().str.strip()
    out = out.str.replace(_SEP, ";", regex=True)
    return out.str.replace(_WS, " ", regex=True)


def replay_strict(grammy: pd.DataFrame, spotify: pd.DataFrame) -> pd.DataFrame:
    g = grammy.copy()
    s = spotify.copy()

    # clean: P1 (literal '' comparison — NaN passes) + P2 column drops.
    both_empty = (g["nominee"] == "") & (g["artist"] == "")
    g = g[~both_empty.fillna(False)].drop(
        columns=["published_at", "updated_at", "workers", "img"]
    )

    # normalize (second-pass semantics: astype(str) → 'nan' for NULLs).
    for c in ("category", "nominee", "artist"):
        g[f"{c}_norm"] = _norm_full(g[c])
    s["track_name_norm"] = s["track_name"].astype(str).str.lower().str.strip()
    s["album_name_norm"] = s["album_name"].astype(str).str.lower().str.strip()
    s["artists_orig"] = s["artists"]
    s["artists_norm"] = (
        s["artists"].astype(str).str.lower().str.replace("&", ";").str.replace(",", ";")
    )

    # split song/other.
    is_song = g["category_norm"].map(lambda x: any(k in x for k in SONG_KEYWORDS))
    g_song, g_other = g[is_song], g[~is_song]

    # spotify_top: argmax per (artists_norm, track_name_norm) —
    # deterministic total order (engine delta vs pandas quicksort).
    s_top = s.sort_values(
        ["popularity", "track_id", "track_genre"], ascending=[False, True, True]
    ).drop_duplicates(subset=["artists_norm", "track_name_norm"], keep="first")

    # fuzzy two-pass match, row-at-a-time (fine for a test oracle).
    merged_rows = []
    for _, row in g_song.iterrows():
        artist, song = row["artist_norm"], row["nominee_norm"]
        cand = s_top[
            s_top["artists_norm"].str.contains(artist, regex=False, na=False)
            & (s_top["track_name_norm"] == song)
        ]
        if cand.empty:
            prefix = song.split("(")[0].strip()
            cand = s_top[
                s_top["artists_norm"].str.contains(artist, regex=False, na=False)
                & s_top["track_name_norm"].str.contains(prefix, regex=False, na=False)
            ]
        if not cand.empty:
            best = cand.sort_values(
                ["popularity", "track_id", "track_genre"], ascending=[False, True, True]
            ).iloc[0]
            merged_rows.append(pd.concat([row, best]))
        else:
            merged_rows.append(row)
    merged_song = pd.DataFrame(merged_rows)

    merged = pd.concat([merged_song, g_other], ignore_index=True)

    # finalize: drop helpers, sentinel only on string columns, winner
    # bool-or-null, typed casts (engine semantics — see pipeline doc).
    merged = merged.drop(columns=[c for c in FINAL_DROP if c in merged.columns])
    merged["winner"] = (
        merged["winner"].astype(str).str.lower().map({"true": True, "false": False})
    ).astype(object)
    for c in FLOAT_COLS:
        if c in merged.columns:
            merged[c] = merged[c].replace("N/A", np.nan).astype(float)
    for c in INT_COLS:
        if c in merged.columns:
            merged[c] = merged[c].replace("N/A", np.nan).astype(float).astype("Int64")
    for c in merged.columns:
        if merged[c].dtype == object and c not in ("winner", "explicit"):
            merged[c] = merged[c].where(pd.notnull(merged[c]), "N/A")
    return merged
