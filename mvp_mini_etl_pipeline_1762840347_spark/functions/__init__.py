from .js import js_or, js_truthy, js_str_or  # noqa: F401
