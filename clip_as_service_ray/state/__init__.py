"""Index state: posting-list codec, manifests, broadcast helpers."""
