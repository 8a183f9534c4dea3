#!/usr/bin/env bash
# Bash flag parser for staged recipe scripts — native replacement for the
# kaldi parse_options.sh idiom (SURVEY.md §2.9): for every `--foo-bar value`
# pair, sets the shell variable `foo_bar=value` if it was declared before
# sourcing this file; errors on undeclared options. Also supports
# `--help/-h` printing the calling script's header comment.

while true; do
  [ -z "${1:-}" ] && break
  case "$1" in
    --help|-h)
      sed -n '2,/^[^#]/p' "$0" | grep '^#' | sed 's/^# \?//'
      exit 0
      ;;
    --*)
      name=$(echo "$1" | sed 's/^--//' | tr '-' '_')
      # must already be declared in the calling script
      if ! eval "[ -n \"\${$name+x}\" ]"; then
        echo "$0: unknown option $1" >&2
        exit 1
      fi
      [ -z "${2+x}" ] && { echo "$0: missing value for $1" >&2; exit 1; }
      eval "$name=\"\$2\""
      shift 2
      ;;
    *)
      break
      ;;
  esac
done
true
