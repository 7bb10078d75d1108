"""Pure, deterministic leaf functions shared by the Ray stages and the
serial oracle. Nothing here touches Ray."""
