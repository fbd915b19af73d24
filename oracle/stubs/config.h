/* Oracle build of the reference codec: scalar-only (no SSE2/asm).
 * Used solely to generate golden test fixtures; never linked into
 * the TPU framework. */
#ifndef ORACLE_CONFIG_H
#define ORACLE_CONFIG_H
/* intentionally empty: HAVE_SSE2 NOT defined -> scalar fallback paths */
#endif
