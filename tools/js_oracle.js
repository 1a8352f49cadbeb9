// Parity oracle: evaluates the REFERENCE implementation (read-only,
// at /root/reference) and executes its scalar functions on inputs
// supplied as JSON on stdin: [{fn: "name", args: [...]}, ...].
// Prints the JSON list of results. Used by tests/test_js_parity.py to
// check the Spark engine against the reference's actual JS behavior
// without copying any reference code into this repo.
// NOTE: deliberately not strict mode — the eval below must define the
// reference's functions in this scope.
const fs = require("fs");

const src = fs.readFileSync(
  "/root/reference/apps-scripts/code-LLM-intergration.js",
  "utf8"
);
eval(src);

const FNS = {
  hostFromUrl_: (u) => hostFromUrl_(u),
  makeCanonical_: (u) => makeCanonical_(u),
  niceCase_: (s) => niceCase_(s),
  guessCompanyFromUrl_: (u) => guessCompanyFromUrl_(u),
  cleanRole_: (t, c) => cleanRole_(t, c),
  decodeHtml_: (s) => decodeHtml_(s),
  stripEmojis_: (s) => stripEmojis_(s),
  isGenericTitle_: (s) => isGenericTitle_(s),
  isAtsHost_: (h) => isAtsHost_(h),
  isAggregatorHost_: (h) => isAggregatorHost_(h),
  getMeta_: (h, k, a) => getMeta_(h, k, a),
  getTitle_: (h) => getTitle_(h),
  getH1_: (h) => getH1_(h),
  textPreview_: (h, n) => textPreview_(h, n),
  hasUsefulSignal_: (h) => hasUsefulSignal_(h),
};

const tasks = JSON.parse(fs.readFileSync(0, "utf8"));
const out = tasks.map((t) => FNS[t.fn](...t.args));
process.stdout.write(JSON.stringify(out));
