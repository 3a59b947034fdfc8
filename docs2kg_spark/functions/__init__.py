from docs2kg_spark.functions.ids import det_id_col, entity_node_id  # noqa: F401
from docs2kg_spark.functions.labels import sanitize_label_col, sanitize_label_py  # noqa: F401
