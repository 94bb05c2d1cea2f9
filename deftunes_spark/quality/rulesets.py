"""The three verbatim reference rulesets (glue.tf:1-26), as DQDL text.

Parsed at import via ``parse_dqdl`` so the parser is exercised on the
real strings; keys match the silver tables they bind to.
"""

from __future__ import annotations

from deftunes_spark.quality.dqdl import parse_dqdl

_DQDL_TEXT = {
    # terraform/modules/data_quality/glue.tf:3 (songs)
    "songs": (
        'Rules = [ IsComplete "track_id", ColumnLength "track_id" = 18, '
        'IsComplete "song_id", ColumnLength "song_id" = 18, '
        'IsComplete "artist_id" ]'
    ),
    # glue.tf:12 (sessions)
    "sessions": (
        'Rules = [ IsComplete "user_id", IsComplete "session_id", '
        'ColumnLength "user_id" = 36, ColumnLength "session_id" = 36, '
        'IsComplete "song_id", ColumnValues "price" <= 2 ]'
    ),
    # glue.tf:21 (users)
    "users": (
        'Rules = [ IsComplete "user_id", Uniqueness "user_id" > 0.95, '
        'IsComplete "user_lastname", IsComplete "user_name", '
        'IsComplete "user_since" ]'
    ),
}

REFERENCE_RULESETS = {name: parse_dqdl(text) for name, text in _DQDL_TEXT.items()}
