"""Declared schemas for the reference-shaped tables (FIXTURES.md §A).

The reference infers everything (pandas read_csv / read_sql); the
engine declares. Types recovered from eda.ipynb cell 3/4 outputs and
the DAG's final casts (dags/etl_grammy_spotify.py:275-293).
"""

from __future__ import annotations

from pyspark.sql import types as T

#: `grammy` — award nominations (eda.ipynb cell 3: 4,810 × 11).
#: published_at / updated_at stay strings in the pipeline (only the
#: seed loader parses them — dags/cargar_grammy.py:9-10).
GRAMMY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("year", T.IntegerType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("published_at", T.StringType(), True),
        T.StructField("updated_at", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("nominee", T.StringType(), True),
        T.StructField("artist", T.StringType(), True),
        T.StructField("workers", T.StringType(), True),
        T.StructField("img", T.StringType(), True),
        T.StructField("winner", T.StringType(), True),
    ]
)

#: `spotify` — tracks (eda.ipynb cell 4: 114,000 × 21; one row per
#: (track, genre)). "Unnamed: 0" is the CSV index artifact the
#: reference drops at :267-268.
SPOTIFY_SCHEMA = T.StructType(
    [
        T.StructField("Unnamed: 0", T.LongType(), True),
        T.StructField("track_id", T.StringType(), True),
        T.StructField("artists", T.StringType(), True),
        T.StructField("album_name", T.StringType(), True),
        T.StructField("track_name", T.StringType(), True),
        T.StructField("popularity", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("explicit", T.BooleanType(), True),
        T.StructField("danceability", T.DoubleType(), True),
        T.StructField("energy", T.DoubleType(), True),
        T.StructField("key", T.IntegerType(), True),
        T.StructField("loudness", T.DoubleType(), True),
        T.StructField("mode", T.IntegerType(), True),
        T.StructField("speechiness", T.DoubleType(), True),
        T.StructField("acousticness", T.DoubleType(), True),
        T.StructField("instrumentalness", T.DoubleType(), True),
        T.StructField("liveness", T.DoubleType(), True),
        T.StructField("valence", T.DoubleType(), True),
        T.StructField("tempo", T.DoubleType(), True),
        T.StructField("time_signature", T.IntegerType(), True),
        T.StructField("track_genre", T.StringType(), True),
    ]
)

#: Audio-feature columns cast to double at finalize (:279-284).
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

#: Columns cast to nullable int at finalize (:286-293).
INT_COLS = ["popularity", "duration_ms", "key", "mode"]

#: Helper/identifier columns dropped at finalize (:266-271).
FINAL_DROP_COLS = [
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

#: The song-routing keywords (:208-210).
SONG_KEYWORDS = ["song", "performance", "recording", "music", "composition", "track"]
