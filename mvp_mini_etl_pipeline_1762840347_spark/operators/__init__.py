from .joins import lookup_join_with_default, collect_members_join  # noqa: F401
