from wikdict_gen_spark.functions.textclean import (  # noqa: F401
    clean_html,
    clean_wiki_syntax,
    clean_inflection,
    is_dummy_sense,
    normalize_sense_num,
    parse_sense,
    strip_gloss_trailer,
    strip_namespace,
    repair_bad_bytes,
    surface_guess,
)
