from dataintegration_ecomprovider_spark.functions.lists import (  # noqa: F401
    encode_quoted_list,
    decode_quoted_list,
    split_composite_key,
)
from dataintegration_ecomprovider_spark.functions.text import (  # noqa: F401
    ci,
    max_id_suffix,
)
