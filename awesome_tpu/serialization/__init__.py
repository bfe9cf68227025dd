from awesome_tpu.serialization.jsonconv import (  # noqa: F401
    to_jsonable,
    from_jsonable,
    save_yaml,
    load_yaml,
    save_json,
    load_json,
    register_rule,
)
