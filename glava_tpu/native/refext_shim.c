/* Differential oracle for the reference's OWN config preprocessor.
 *
 * glsl_ext.c (glava/glsl_ext.c:346-725 `ext_process` and friends) is
 * plain C with zero GL dependencies: a char-state-machine that handles
 * directives (#request/#include/#define/#expand), comment/string/escape
 * tracking, hex-color literals, `@bind[:default]` substitution, and
 * recursive includes with `:`/`@` root specifiers.  The Makefile
 * extracts glsl_ext.h + glsl_ext.c verbatim from /root/reference at
 * BUILD time (local includes stripped) into refext_extracted.inc — no
 * reference code is stored in this repository, and the build is
 * skipped when the reference tree is absent.
 *
 * This file supplies the minimal environment the extracted code needs
 * (struct rd_bind from render.h:42-46, a longjmp-based glava_abort so
 * parse errors return to the caller instead of killing the test
 * process, and an error-capturing fprintf) plus a flat C ABI so the
 * test suite can drive REAL reference preprocessing over our shipped
 * config sources and fuzzed directive streams, and compare:
 *   - the typed request stream (name + decoded args per fmt),
 *   - the processed output text (#line markers, color expansion,
 *     bind substitution, include splicing, #expand codegen),
 *   - abort-vs-success on malformed input (captured error text).
 * See tests/refext.py / tests/test_preprocessor_differential.py.
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdbool.h>
#include <stdarg.h>
#include <setjmp.h>

/* ------------------------------------------------------------------ */
/* minimal glava.h / render.h environment                             */
/* ------------------------------------------------------------------ */

/* render.h:42-46 */
struct rd_bind {
    const char* name;
    const char* stype;
    int type;
};

/* glava.h declares `glava_abort` as a noreturn function pointer; the
 * extracted code calls it on every parse error.  Here it unwinds to
 * the refext_run trampoline so one bad input doesn't kill the whole
 * test process. */
static jmp_buf g_abort_jmp;
static bool g_abort_armed = false;

__attribute__((noreturn)) static void shim_abort(void) {
    if (g_abort_armed)
        longjmp(g_abort_jmp, 1);
    /* abort outside a run (should not happen) */
    abort();
}

static void (*glava_abort)(void) = shim_abort;

/* parse_error() inside the extracted code reports via
 * fprintf(stderr, ...) before aborting; capture the message instead
 * of spamming the test log. */
static char g_err[2048];

static int shim_err_capture(const char* fmt, ...) {
    va_list ap;
    va_start(ap, fmt);
    int r = vsnprintf(g_err, sizeof g_err, fmt, ap);
    va_end(ap);
    return r;
}

#define fprintf(stream, ...) shim_err_capture(__VA_ARGS__)

#include "refext_extracted.inc"

#undef fprintf

/* ------------------------------------------------------------------ */
/* request logging: one generic handler decodes args per the fmt the  */
/* dispatcher itself used, so the log shows exactly what a real       */
/* handler would have received (strtol/strtof/bool semantics included)*/
/* ------------------------------------------------------------------ */

#define MAX_HANDLERS 96
#define MAX_EFUNCS   16
#define US "\x1f" /* field separator in the log */

static struct request_handler g_handlers[MAX_HANDLERS + 1];
static char g_hnames[MAX_HANDLERS][64];
static char g_hfmts[MAX_HANDLERS][16];
static size_t g_n_handlers = 0;

static struct sbuf g_log;

static const char* lookup_fmt(const char* name) {
    for (size_t i = 0; i < g_n_handlers; ++i)
        if (!strcmp(g_hnames[i], name))
            return g_hfmts[i];
    return "";
}

static void generic_handler(const char* name, void** args) {
    const char* fmt = lookup_fmt(name);
    se_append(&g_log, 80, "R" US "%s", name);
    for (size_t i = 0; fmt[i]; ++i) {
        switch (fmt[i]) {
            case 'i': se_append(&g_log, 32, US "%d", *(int*) args[i]); break;
            case 'f': se_append(&g_log, 48, US "%.9g",
                                (double) *(float*) args[i]); break;
            case 'b': se_append(&g_log, 8, US "%d",
                                (int) *(bool*) args[i]); break;
            case 's':
                append(&g_log, US);
                append(&g_log, (const char*) args[i]);
                break;
        }
    }
    append(&g_log, "\n");
}

/* #expand efuncs: fixed trampolines reading a value table (the
 * reference registers EBIND closures, render.c:283-291) */
static size_t g_efunc_vals[MAX_EFUNCS];
static char g_efunc_names[MAX_EFUNCS][64];

#define EF(n) static size_t ef##n(void) { return g_efunc_vals[n]; }
EF(0) EF(1) EF(2) EF(3) EF(4) EF(5) EF(6) EF(7)
EF(8) EF(9) EF(10) EF(11) EF(12) EF(13) EF(14) EF(15)
#undef EF
static size_t (*g_efunc_calls[MAX_EFUNCS])(void) = {
    ef0, ef1, ef2, ef3, ef4, ef5, ef6, ef7,
    ef8, ef9, ef10, ef11, ef12, ef13, ef14, ef15,
};
static struct glsl_ext_efunc g_efuncs[MAX_EFUNCS + 1];

static struct rd_bind g_binds[64];
static char g_bind_names[64][64];

/* split a '\n'-separated, US-field spec into the fixed tables */
static size_t parse_spec(const char* spec, char names[][64],
                         char fmts[][16], size_t max) {
    size_t n = 0;
    if (!spec)
        return 0;
    const char* p = spec;
    while (*p && n < max) {
        const char* nl = strchr(p, '\n');
        size_t len = nl ? (size_t) (nl - p) : strlen(p);
        const char* us = memchr(p, '\x1f', len);
        size_t nlen = us ? (size_t) (us - p) : len;
        if (nlen >= 64) nlen = 63;
        memcpy(names[n], p, nlen);
        names[n][nlen] = '\0';
        if (fmts) {
            size_t flen = us ? len - nlen - 1 : 0;
            if (flen >= 16) flen = 15;
            memcpy(fmts[n], us ? us + 1 : "", flen);
            fmts[n][flen] = '\0';
        }
        ++n;
        if (!nl)
            break;
        p = nl + 1;
    }
    return n;
}

/* ------------------------------------------------------------------ */
/* flat ABI                                                           */
/* ------------------------------------------------------------------ */

/* Run ext_process over `src`.  handler_spec: "name\x1Ffmt\n"...;
 * bind_spec: "name\n"... or NULL; efunc_spec: "name\x1Fvalue\n"... or
 * NULL.  On success returns 0 and sets *out_processed (malloc'd copy,
 * free with refext_free) and *out_log.  On parse abort returns 1;
 * *out_log holds requests up to the abort and *out_err the captured
 * message.  Aborted runs leak the partially-built reference buffers —
 * acceptable for a short-lived test process. */
int refext_run(const char* src, long src_len, const char* fname,
               const char* cd, const char* cfd, const char* dd,
               const char* handler_spec, const char* bind_spec,
               const char* efunc_spec,
               char** out_processed, char** out_log, char** out_err) {
    g_n_handlers = parse_spec(handler_spec, g_hnames, g_hfmts,
                              MAX_HANDLERS);
    for (size_t i = 0; i < g_n_handlers; ++i)
        g_handlers[i] = (struct request_handler) {
            .name = g_hnames[i], .fmt = g_hfmts[i],
            .handler = generic_handler,
        };
    g_handlers[g_n_handlers] = (struct request_handler) { .name = NULL };

    static char fmt_scratch[64][16];
    size_t n_binds = parse_spec(bind_spec, g_bind_names, NULL, 63);
    for (size_t i = 0; i < n_binds; ++i)
        g_binds[i] = (struct rd_bind) { .name = g_bind_names[i],
                                        .stype = "float", .type = 0 };
    g_binds[n_binds] = (struct rd_bind) { .name = NULL };

    static char efv[MAX_EFUNCS][16];
    size_t n_ef = parse_spec(efunc_spec, g_efunc_names, efv, MAX_EFUNCS);
    for (size_t i = 0; i < n_ef; ++i) {
        g_efunc_vals[i] = (size_t) strtol(efv[i], NULL, 10);
        g_efuncs[i] = (struct glsl_ext_efunc) { .name = g_efunc_names[i],
                                                .call = g_efunc_calls[i] };
    }
    g_efuncs[n_ef] = (struct glsl_ext_efunc) { .name = NULL };
    (void) fmt_scratch;

    g_log = (struct sbuf) { .buf = malloc(256), .at = 0, .bsize = 256 };
    g_log.buf[0] = '\0';
    g_err[0] = '\0';

    struct glsl_ext ext = {
        .source     = src,
        .source_len = (size_t) src_len,
        .cd         = cd,
        .cfd        = cfd,
        .dd         = dd,
        .handlers   = g_handlers,
        .binds      = bind_spec ? g_binds : NULL,
        .efuncs     = efunc_spec ? g_efuncs : NULL,
    };

    int rc;
    g_abort_armed = true;
    if (setjmp(g_abort_jmp) == 0) {
        ext_process(&ext, fname);
        *out_processed = strdup(ext.processed ? ext.processed : "");
        ext_free(&ext);
        rc = 0;
    } else {
        *out_processed = NULL; /* aborted mid-parse; buffers leak */
        rc = 1;
    }
    g_abort_armed = false;
    *out_log = g_log.buf;
    *out_err = strdup(g_err);
    return rc;
}

void refext_free(char* p) {
    free(p);
}

/* Direct differential for the hex-color parser (glsl_ext.c:88-122):
 * writes up to 4 floats into out, returns the bool result. */
int refext_parse_color(const char* hex, long elem_sz, float* out) {
    out[0] = 0.0F; out[1] = 0.0F; out[2] = 0.0F; out[3] = 1.0F;
    return (int) ext_parse_color(hex, (size_t) elem_sz,
                                 (float*[]) { &out[0], &out[1],
                                              &out[2], &out[3] });
}
